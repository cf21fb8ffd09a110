#!/bin/bash
# Round-5 TPU evidence queue (VERDICT r4 items 1/2/5/7), in priority
# order, each stage resumable so a killed session just re-runs this
# script. ONE process holds the TPU; stages run strictly sequentially.
#
#   1. Serving sweep: lanes x stage-dtype grid + RT latency SLO column
#      -> SERVE_SWEEP.json                       (VERDICT items 2 + 7)
#   2. Offline bench sweep round-5 arms: B=80/96 interior + int8/int8mm
#      quantized-FE arms -> BENCH_SWEEP.json     (VERDICT item 5)
#   3. Seed-2 50k campaign -> LONG_CAMPAIGN_s2.json (VERDICT item 1,
#      third point of the repeatability distribution)
#
# Run: nohup bash scripts/run_queue_r5_tpu.sh > /tmp/queue_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

stamp "stage 1: serving sweep"
python scripts/bench_serve_sweep.py
stamp "stage 2: bench sweep (round-5 arms)"
python scripts/bench_sweep.py
stamp "stage 3: seed-2 long campaign"
LC_SEED=2 python scripts/long_campaign.py
stamp "queue complete"
