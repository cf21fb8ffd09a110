#!/bin/bash
# Round-5 chain: wait for the in-flight serving sweep (PID in
# /tmp/serve_sweep.pid) to release the TPU, then run the remaining
# queue stages from scripts/run_queue_r5_tpu.sh strictly sequentially.
# Every stage is resumable, so re-running this script after a kill is
# always safe. ONE process holds the TPU at a time.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

if [ -f /tmp/serve_sweep.pid ]; then
  SWEEP_PID=$(cat /tmp/serve_sweep.pid)
  stamp "waiting on serve sweep pid=$SWEEP_PID"
  while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 20; done
  stamp "serve sweep finished"
fi

stamp "stage 2: bench sweep (round-5 arms: B=80/96 + int8 FE)"
python scripts/bench_sweep.py
stamp "stage 3: seed-2 long campaign"
LC_SEED=2 python scripts/long_campaign.py
stamp "chain complete"
