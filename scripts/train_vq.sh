#!/usr/bin/env bash
# PQ-VAE stage training (reference train_vq.sh surface)
exec python -m probtalk_tpu.cli.train --config_file configs/vq.json "$@"
