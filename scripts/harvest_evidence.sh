#!/bin/bash
# Force-commit parity/evidence artifacts as they land. experiments/ is
# .gitignored and the directory is wiped between build sessions, which has
# cost three sessions of retraining: the shared FGD embedder trio, the
# torch reference arms, and the jax ablation arms all died with /tmp.
# Committing the (small, final) checkpoints and generation tensors makes
# the evidence durable: the stage-resumable queue scripts then SKIP
# anything already present instead of retraining it.
#
# Usage: bash scripts/harvest_evidence.sh [commit-message-suffix]
set -e
cd /root/repo

# Only the artifacts scoring/resume actually needs survive:
#   * the shared FGD embedder trio (small) — score() is meaningless
#     without it; committing it also pins scores across sessions
#   * the torch reference checkpoints + both sides' generation tensors
#   * queue markers
# The big demo-campaign stage checkpoints (vq alone is ~414 MB of Adam
# state) are NOT committed — EVAL_DEMO.json is their durable output.
paths=()
for p in \
    experiments/demo_ckpt/emb_fe experiments/demo_ckpt/emb_bh \
    experiments/demo_ckpt/emb_fbhe \
    experiments/parity/torch_vq_1500.pth \
    experiments/parity_full \
    experiments/trio.done experiments/torch_vq.done \
    experiments/torch_gen0.done experiments/scored.done \
    experiments/cpu_queue.done experiments/tpu_queue.done; do
  [ -e "$p" ] && paths+=("$p")
done
[ ${#paths[@]} -eq 0 ] && { echo "nothing to harvest"; exit 0; }

# guard: never commit a runaway-size artifact tree
total=$(du -sm "${paths[@]}" 2>/dev/null | awk '{s+=$1} END {print s}')
if [ "${total:-0}" -gt 1500 ]; then
  echo "harvest too large (${total} MB > 1500 MB), refusing"; exit 1
fi

git add -f "${paths[@]}"
if git diff --cached --quiet; then
  echo "no new evidence"; exit 0
fi
git commit -q -m "Harvest parity evidence artifacts${1:+: $1}

Durable checkpoints/generations for the stage-resumable parity queue
(experiments/ is wiped between sessions; the queues resume from these).

No-Verification-Needed: evidence-data-only commit, no product code"
echo "committed: ${total} MB"
