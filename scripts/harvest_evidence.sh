#!/bin/bash
# Force-commit parity/evidence artifacts as they land. experiments/ is
# .gitignored and the directory is wiped between build sessions, which has
# cost three sessions of retraining: the shared FGD embedder trio, the
# torch reference arms, and the jax ablation arms all died with /tmp.
# Committing the (small, final) artifacts makes the evidence durable: the
# stage-resumable queue scripts then SKIP anything already present.
#
# Usage: bash scripts/harvest_evidence.sh [commit-message-suffix]
set -e
cd /root/repo

# Only what scoring/resume actually needs survives:
#   * the shared FGD embedder trio (small) — score() is meaningless
#     without it; committing it also pins scores across sessions/rounds
#   * the SMALL final torch VQ artifact (state.VQ only, written atomically
#     at step==STEPS by parity_campaign.py) — NOT the ~450 MB in-place-
#     rewritten resume checkpoint (ADVICE r3)
#   * both sides' final generation tensors + per-clip torch gen parts
#   * queue markers — only ever touched on stage success
# NOT committed: torch pred/ref resume checkpoints and orbax jax_vq state
# (hundreds of MB of optimizer moments; their durable outputs are the gen
# tensors), demo-campaign stage checkpoints (EVAL_DEMO.json is theirs).
paths=()
for p in \
    experiments/demo_ckpt/emb_fe experiments/demo_ckpt/emb_bh \
    experiments/demo_ckpt/emb_fbhe \
    experiments/parity/torch_vq_1500_final.pth \
    experiments/parity_full/torch_pred_600_final.pth \
    experiments/parity_full/torch_ref_600_final.pth \
    experiments/parity_full/torch_pred_600_s1_final.pth \
    experiments/parity_full/torch_ref_600_s1_final.pth \
    experiments/conv.done \
    experiments/parity_full/gen_torch.npz \
    experiments/parity_full/gen_torch_s1.npz \
    experiments/parity_full/gen_torch_parts \
    experiments/parity_full/gen_torch_parts_s1 \
    experiments/trio.done experiments/torch_vq.done \
    experiments/torch_gen0.done experiments/torch_gen1.done \
    experiments/tvq.done experiments/scored.done experiments/long.done \
    experiments/cpu_queue.done experiments/tpu_queue.done; do
  [ -e "$p" ] && paths+=("$p")
done
for f in experiments/parity_full/gen_jax_*.npz; do
  [ -e "$f" ] && paths+=("$f")
done
[ ${#paths[@]} -eq 0 ] && { echo "nothing to harvest"; exit 0; }

# guard: never commit a runaway-size artifact tree. Fail CLOSED: an empty
# du result must block the commit, not bypass the check (ADVICE r3).
total=$(du -sm "${paths[@]}" | awk '{s+=$1} END {print s}')
[ -z "$total" ] && { echo "size check failed (empty du)"; exit 1; }
if [ "$total" -gt 1500 ]; then
  echo "harvest too large (${total} MB > 1500 MB), refusing"; exit 1
fi

# guard 2 (ADVICE r4 / VERDICT r4 item 6): the per-invocation cap above
# does not bound HISTORY growth — every harvest adds blobs permanently
# (git history is immutable; deleting files later doesn't shrink clones).
# Cap the bytes that are NEW to git this harvest at 20 MB; a ledger
# records the cumulative committed-artifact size across rounds. Override
# for a deliberate large harvest with HARVEST_ALLOW_MB=<n>.
new_mb=0
declare -a new_files=()
for p in "${paths[@]}"; do
  while IFS= read -r f; do
    if ! git ls-files --error-unmatch "$f" >/dev/null 2>&1; then
      sz=$(du -sm "$f" | awk '{print $1}')
      new_mb=$((new_mb + sz)); new_files+=("$f")
    fi
  done < <(find "$p" -type f)
done
cap=${HARVEST_ALLOW_MB:-20}
if [ "$new_mb" -gt "$cap" ]; then
  echo "harvest adds ${new_mb} MB of NEW blobs (> ${cap} MB cap):"
  printf '  %s\n' "${new_files[@]}"
  echo "strip artifacts (weights-only subtrees) or set HARVEST_ALLOW_MB"
  exit 1
fi
ledger=experiments/harvest_ledger.txt
prev=$( [ -f "$ledger" ] && tail -1 "$ledger" | awk '{print $1}' || echo 0 )
echo "$((prev + new_mb)) MB cumulative after $(date -u +%F) (+${new_mb})" \
  >> "$ledger"
paths+=("$ledger")

git add -f "${paths[@]}"
# never commit a transient atomic-write temp (atomic_savez's *.tmp.npz,
# torch's .pth.tmp) caught mid-write while a queue is still generating
git reset -q HEAD -- ':(glob)experiments/**/*.tmp' ':(glob)experiments/**/*.tmp.npz' || true
if git diff --cached --quiet; then
  echo "no new evidence"; exit 0
fi
git commit -q -m "Harvest parity evidence artifacts${1:+: $1}

Durable checkpoints/generations for the stage-resumable parity queue
(experiments/ is wiped between sessions; the queues resume from these).

No-Verification-Needed: evidence-data-only commit, no product code"
echo "committed: ${total} MB"
