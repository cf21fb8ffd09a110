"""Code-target entropy audit: is the predictor CE / body-FGD gap a VQ
target-distribution confound?

Each side of the full-system parity campaign predicts ITS OWN VQ's code
sequences (torch predictor learns torch-VQ codes, jax learns jax-VQ
codes — scripts/parity_full_campaign.py). If one VQ spreads codebook
usage more uniformly, its codes are intrinsically harder to predict:
the CE (and anything downstream of code quality) differs for reasons
that have nothing to do with the predictor implementations.

This script encodes the SAME normalized fbhe windows with both trained
VQs (experiments/parity/torch_vq_1500.pth and
experiments/parity_full/jax_vq) and reports, per PQ group:
  - codebook usage (codes hit at least once)
  - unigram entropy (nats) and perplexity — the CE a frequency-only
    predictor would plateau at
  - temporal bigram conditional entropy H(c_t | c_{t-1}) (MLE, equally
    biased for both sides at identical token counts — comparable)
  - per-frame code-change rate (temporal volatility of the targets)

Run on CPU only (never touches the TPU):
  PROBTALK_FORCE_CPU=1 PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/code_entropy_audit.py
Writes CODE_ENTROPY.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

CACHE = os.environ.get("PROBTALK_CACHE", "/tmp/ptlk_cache_r2")
DIR = os.path.join(REPO, "experiments", "parity_full")
VQ_TORCH = os.path.join(REPO, "experiments", "parity", "torch_vq_1500.pth")
BS, WINDOW = 8, 176
N_BATCH = 40  # eval windows (seeded, disjoint from nothing — usage stats)


def log(m):
    print(m, flush=True)


def load_windows():
    from probtalk_tpu.cli.data_build import build_cache, load_cached_clips
    from probtalk_tpu.data.dataset import WindowedDataset
    from probtalk_tpu.core import body_parts

    build_cache("/root/reference/demo_audio", CACHE,
                ["oliver", "chemistry", "seth", "conan"],
                "/root/reference/data_utils/hand_component.json",
                audio_feat="mfcc")
    clips, mean, std = load_cached_clips(CACHE)
    ds = WindowedDataset(clips, window=WINDOW, stride=6, mean=mean, std=std)
    idx = body_parts.c_index(True)
    wins = []
    seed = 123
    while len(wins) < N_BATCH:
        for b in ds.batches(BS, seed=seed):
            wins.append(np.concatenate(
                [b["poses"][..., :6], b["poses"][..., idx], b["expression"]],
                -1).astype(np.float32))
            if len(wins) == N_BATCH:
                break
        seed += 1
    return wins  # list of (B, T, 376)


def torch_codes(wins):
    import torch
    from reference_loader import load_reference, ref_import

    assert load_reference()
    cfgmod = ref_import("trainer.config")
    config = cfgmod.load_JsonConfig("/root/reference/config/vq.json")
    config.Data.data_root = "/root/reference/demo_audio"
    vq_teacher = ref_import("nets.inpainting.vq_teacher")
    args = argparse.Namespace(gpu="cpu", infer=False, save_dir="/tmp",
                              exp_name="entropy", speakers=["oliver"],
                              resume=False, pretrained_pth=None)
    wrapper = vq_teacher.TrainWrapper(args, config)
    saved = torch.load(VQ_TORCH, map_location="cpu", weights_only=False)
    wrapper.load_state_dict(saved["state"])
    net = getattr(wrapper, "VQ", None) or getattr(wrapper, "generator")
    net.eval()
    out = []
    with torch.no_grad():
        for w in wins:
            x = torch.from_numpy(w.transpose(0, 2, 1))  # (B, C, T)
            _, qo, _ = (net.module if hasattr(net, "module") else net).encode(
                gt_poses=x)
            idx = qo.loss  # the reference stores indices here
            out.append(np.asarray(idx).reshape(w.shape[0], -1, 4))
    return np.concatenate(out, 0)  # (N, T/8, 4)


def jax_codes(wins):
    import jax.numpy as jnp
    import optax
    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.train.state import create_train_state
    from probtalk_tpu.train.trainer import Checkpointer

    vq = VQVAE(in_dim=376, embedding_dim=512, num_codes=128, groups=4,
               hiddens=1024, res_layers=2)
    x0 = jnp.zeros((BS, WINDOW, 376), jnp.float32)
    st = create_train_state(vq, (x0,), jax.random.key(0), optax.adam(1e-4),
                            init_kwargs={"train": True})
    restored, _ = Checkpointer(os.path.join(DIR, "jax_vq")).restore(st)
    assert restored is not None, "train the jax VQ first (parity campaign)"
    variables = {"params": restored.params, **restored.mutables}

    @jax.jit
    def enc(v, x):
        _, _, idx = vq.apply(v, x, train=False, method=vq.encode)
        return idx

    out = [np.asarray(enc(variables, jnp.asarray(w))) for w in wins]
    return np.concatenate(out, 0)  # (N, T/8, 4)


def stats(codes, num_codes=128):
    """codes (N, S, G) -> per-group stats dict."""
    n, s, g = codes.shape
    per = []
    for gi in range(g):
        c = codes[..., gi]
        cnt = np.bincount(c.reshape(-1), minlength=num_codes).astype(np.float64)
        p = cnt / cnt.sum()
        nz = p > 0
        h1 = float(-(p[nz] * np.log(p[nz])).sum())
        # bigram conditional entropy (MLE; equal bias across sides)
        big = np.zeros((num_codes, num_codes))
        np.add.at(big, (c[:, :-1].reshape(-1), c[:, 1:].reshape(-1)), 1.0)
        rows = big.sum(1, keepdims=True)
        pr = rows / rows.sum()
        pc = np.divide(big, rows, out=np.zeros_like(big), where=rows > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            hrow = -np.nansum(np.where(pc > 0, pc * np.log(pc), 0.0), 1)
        h2 = float((pr.ravel() * hrow).sum())
        per.append({
            "used": int((cnt > 0).sum()),
            "unigram_entropy_nats": round(h1, 4),
            "perplexity": round(float(np.exp(h1)), 2),
            "bigram_cond_entropy_nats": round(h2, 4),
            "change_rate": round(float((c[:, 1:] != c[:, :-1]).mean()), 4),
        })
    agg = {
        "mean_unigram_entropy_nats": round(
            float(np.mean([q["unigram_entropy_nats"] for q in per])), 4),
        "mean_bigram_cond_entropy_nats": round(
            float(np.mean([q["bigram_cond_entropy_nats"] for q in per])), 4),
        "mean_change_rate": round(
            float(np.mean([q["change_rate"] for q in per])), 4),
        "mean_used": round(float(np.mean([q["used"] for q in per])), 1),
        "tokens_per_group": int(n * s),
    }
    return {"per_group": per, **agg}


def main():
    wins = load_windows()
    log(f"{len(wins)} batches of {wins[0].shape}")
    jc = jax_codes(wins)
    log(f"jax codes {jc.shape}")
    tc = torch_codes(wins)
    log(f"torch codes {tc.shape}")
    out = {"jax": stats(jc), "torch": stats(tc), "note": (
        "4*CE floor for a frequency-only predictor = sum of per-group "
        "unigram entropies; campaign CE is summed over 4 groups "
        "(predictor.py:268 adds per-group CE)")}
    # the campaign loss sums 4 per-group CEs — report comparable floors
    for k, codes in (("jax", jc), ("torch", tc)):
        out[k]["ce_floor_unigram_sum4"] = round(
            4 * out[k]["mean_unigram_entropy_nats"], 3)
        out[k]["ce_floor_bigram_sum4"] = round(
            4 * out[k]["mean_bigram_cond_entropy_nats"], 3)
    print(json.dumps(out, indent=1))
    json.dump(out, open(os.path.join(REPO, "CODE_ENTROPY.json"), "w"),
              indent=1)


if __name__ == "__main__":
    main()
