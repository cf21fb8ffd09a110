#!/bin/bash
# Round-4 CPU queue (torch reference side; never touches the TPU).
# experiments/ is wiped between sessions; durable artifacts are committed
# by scripts/harvest_evidence.sh as stages land.
#
# ADVICE r3 fix: markers land ONLY when the stage actually succeeded
# (`python ... && touch`), never unconditionally — a committed false
# marker makes every future session skip a stage that never ran.
# Order: data cache (shared with the TPU queue via a marker) -> torch VQ
# 1500 -> torch predictor/refiner/gen seed 0 (unblocks scoring) -> seed _s1.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PROBTALK_FORCE_CPU=1
export PYTHONHASHSEED=0
mkdir -p experiments
M=/root/repo/experiments
LOG=$M/queue_cpu.log
exec >> "$LOG" 2>&1

if [ ! -f $M/cache.done ]; then
  echo "=== $(date +%T) building the shared data cache ==="
  python - <<'EOF' && touch $M/cache.done
import jax
jax.config.update("jax_platforms", "cpu")   # never grab the TPU here
from probtalk_tpu.cli.data_build import build_cache
build_cache("/root/reference/demo_audio", "/tmp/ptlk_cache_r2",
            ["oliver", "chemistry", "seth", "conan"],
            "/root/reference/data_utils/hand_component.json",
            audio_feat="mfcc")
EOF
fi
[ -f $M/cache.done ] || { echo "=== cache build FAILED ==="; exit 1; }

if [ ! -f $M/torch_vq.done ]; then
  echo "=== $(date +%T) torch VQ 1500 (parity_campaign) ==="
  PARITY_STEPS=1500 python scripts/parity_campaign.py torch \
    && touch $M/torch_vq.done || { echo "=== torch VQ FAILED ==="; exit 1; }
fi

if [ ! -f $M/torch_gen0.done ]; then
  echo "=== $(date +%T) torch predictor+refiner+gen, seed 0 ==="
  python scripts/parity_full_campaign.py torch_pred torch_ref gen_torch \
    && touch $M/torch_gen0.done || { echo "=== torch seed0 FAILED ==="; exit 1; }
fi

if [ ! -f $M/torch_gen1.done ]; then
  echo "=== $(date +%T) torch predictor+refiner+gen, seed tag _s1 ==="
  PARITY_TORCH_TAG=_s1 \
    python scripts/parity_full_campaign.py torch_pred torch_ref gen_torch \
    && touch $M/torch_gen1.done || { echo "=== torch seed1 FAILED ==="; exit 1; }
fi

touch $M/cpu_queue.done
echo "=== $(date +%T) cpu queue done ==="
