#!/bin/bash
# Waits for the CPU queue's torch seed-0 artifacts, then runs the
# converted-checkpoint end-to-end generation (scripts/converted_e2e.py,
# CPU — never touches the TPU the arm queue owns) and touches conv.done.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
M=/root/repo/experiments
mkdir -p "$M"
LOG=$M/conv_e2e.log
exec >> "$LOG" 2>&1

[ -f $M/conv.done ] && exit 0
echo "=== $(date +%T) waiting for torch seed-0 artifacts ==="
while [ ! -f $M/torch_gen0.done ]; do sleep 60; done
echo "=== $(date +%T) converted e2e (CPU) ==="
python scripts/converted_e2e.py && touch $M/conv.done \
  || echo "=== converted e2e FAILED ==="
