#!/usr/bin/env bash
# holistic FGD benchmark (reference test_holistic.sh surface)
exec python -m probtalk_tpu.cli.test_holistic --config_file configs/transformer.json "$@"
