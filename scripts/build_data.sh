#!/usr/bin/env bash
# preprocess a SHOW-layout dataset into the training cache
exec python -m probtalk_tpu.cli.data_build "$@"
