#!/usr/bin/env bash
# audio file -> motion (+video with smplx_npz_path set)
exec python -m probtalk_tpu.cli.demo --config_file configs/transformer.json "$@"
