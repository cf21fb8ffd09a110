#!/usr/bin/env bash
# predictor/refiner stage training (reference train_transformer.sh surface)
# sine positional encoding toggle mirrors the reference env knob
export sine=${sine:-1}
exec python -m probtalk_tpu.cli.train --config_file configs/transformer.json "$@"
