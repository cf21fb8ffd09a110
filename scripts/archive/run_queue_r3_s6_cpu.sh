#!/bin/bash
# Round-3 session-6 CPU queue (torch reference side; never touches the TPU).
# experiments/ is wiped between sessions, so artifacts that land are
# force-committed by the session driver (see scripts/harvest_evidence.sh)
# to finally make the evidence durable.
# Order: data cache (shared with the TPU queue via a marker) -> torch VQ
# 1500 -> torch predictor/refiner/gen seed 0 (unblocks scoring) -> seed _s1.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PROBTALK_FORCE_CPU=1
export PYTHONHASHSEED=0
mkdir -p experiments
LOG=/root/repo/experiments/queue_cpu.log
exec >> "$LOG" 2>&1

if [ ! -f /root/repo/experiments/cache.done ]; then
  echo "=== $(date +%T) building the shared data cache ==="
  python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")   # never grab the TPU here
from probtalk_tpu.cli.data_build import build_cache
build_cache("/root/reference/demo_audio", "/tmp/ptlk_cache_r2",
            ["oliver", "chemistry", "seth", "conan"],
            "/root/reference/data_utils/hand_component.json",
            audio_feat="mfcc")
EOF
  touch /root/repo/experiments/cache.done
fi

echo "=== $(date +%T) torch VQ 1500 (parity_campaign) ==="
PARITY_STEPS=1500 python scripts/parity_campaign.py torch
touch /root/repo/experiments/torch_vq.done

echo "=== $(date +%T) torch predictor+refiner+gen, seed 0 ==="
python scripts/parity_full_campaign.py torch_pred torch_ref gen_torch
touch /root/repo/experiments/torch_gen0.done

echo "=== $(date +%T) torch predictor+refiner+gen, seed tag _s1 ==="
PARITY_TORCH_TAG=_s1 python scripts/parity_full_campaign.py torch_pred torch_ref gen_torch
touch /root/repo/experiments/cpu_queue.done
echo "=== $(date +%T) cpu queue done ==="
