"""Apples-to-apples quality parity: torch reference vs probtalk_tpu.

VERDICT round-1 item 3: train BOTH the running torch reference
(``nets/inpainting/vq_teacher.TrainWrapper``, its own optimizer/loss/init)
and the probtalk_tpu VQ stage on the SAME demo-clip batches for the SAME
number of steps with the SAME optimizer family (Adam 1e-4, the reference's
``config/vq.json`` envelope), then compare the reference's own quality
metric — per-window reconstruction L1 "capacity" (``scripts/test_vq.py:54``)
— on identical held-out windows. Writes PARITY_CAMPAIGN.json.

The torch side runs on CPU (no CUDA in this image) and is checkpointed per
stage so interrupted runs resume. Batches are materialized once and fed to
both frameworks bit-identically.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/parity_campaign.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Torch-side runs must never grab the TPU: the CPU queue exports
# PROBTALK_FORCE_CPU=1 (the JAX_PLATFORMS env var alone is overridden by
# the axon site hook — CLAUDE.md).
if os.environ.get("PROBTALK_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

CACHE = os.environ.get("PROBTALK_CACHE", "/tmp/ptlk_cache_r2")
CKPT = os.path.join(REPO, "experiments", "parity")
OUT_JSON = os.path.join(REPO, "PARITY_CAMPAIGN.json")
STEPS = int(os.environ.get("PARITY_STEPS", 300))
BS, WINDOW = 8, 176
LR = 1e-4


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_batches():
    from probtalk_tpu.cli.data_build import build_cache, load_cached_clips
    from probtalk_tpu.data.dataset import WindowedDataset

    build_cache("/root/reference/demo_audio", CACHE,
                ["oliver", "chemistry", "seth", "conan"],
                "/root/reference/data_utils/hand_component.json",
                audio_feat="mfcc")
    clips, mean, std = load_cached_clips(CACHE)
    ds = WindowedDataset(clips, window=WINDOW, stride=6, mean=mean, std=std)
    train, it, seed = [], None, 0
    while len(train) < STEPS:
        for b in ds.batches(BS, seed=seed):
            train.append(b)
            if len(train) == STEPS:
                break
        seed += 1
    evalb = list(ds.batches(BS, seed=99, shuffle=False))
    log(f"{len(train)} train batches, {len(evalb)} eval batches")
    return train, evalb


def fbhe(poses, expr):
    from probtalk_tpu.core import body_parts

    idx = body_parts.c_index(True)
    return np.concatenate([poses[..., :6], poses[..., idx], expr], -1)


# ---------------------------------------------------------------------------

def run_torch(train, evalb):
    import torch
    from reference_loader import load_reference, ref_import

    assert load_reference()
    ckpt_path = os.path.join(CKPT, f"torch_vq_{STEPS}.pth")
    os.makedirs(CKPT, exist_ok=True)

    cfgmod = ref_import("trainer.config")
    config = cfgmod.load_JsonConfig("/root/reference/config/vq.json")
    # the shipped config points at the (absent) full dataset; TrainWrapper
    # init only uses data_root to enumerate speaker dirs
    config.Data.data_root = "/root/reference/demo_audio"
    vq_teacher = ref_import("nets.inpainting.vq_teacher")
    args = argparse.Namespace(gpu="cpu", infer=False, save_dir="/tmp",
                              exp_name="parity", speakers=["oliver"],
                              resume=False, pretrained_pth=None)
    torch.manual_seed(0)
    wrapper = vq_teacher.TrainWrapper(args, config)

    start = 0
    if os.path.exists(ckpt_path):                       # resume mid-run
        saved = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        wrapper.load_state_dict(saved["state"])
        start = saved["step"]
        log(f"torch: restored checkpoint at step {start}")
    if start < STEPS:
        t0 = time.time()
        for i, b in enumerate(train):
            if i < start:
                continue
            bat = {
                "poses": torch.from_numpy(b["poses"].transpose(0, 2, 1)),
                "expression": torch.from_numpy(
                    b["expression"].transpose(0, 2, 1)),
                "aud_feat": torch.from_numpy(b["aud_feat"].transpose(0, 2, 1)),
                "speaker": torch.from_numpy(b["speaker"].astype(np.int64)),
                "epoch": 0,
            }
            _, loss_dict = wrapper(bat)
            if i % 25 == 0 or i == STEPS - 1:
                # write-then-rename: a kill mid-save must not corrupt the
                # resume checkpoint (ADVICE r3)
                torch.save({"state": wrapper.state_dict(), "step": i + 1},
                           ckpt_path + ".tmp")
                os.replace(ckpt_path + ".tmp", ckpt_path)
            if i % 100 == 0 or i == STEPS - 1:
                log(f"torch vq step {i}: " + ", ".join(
                    f"{k}={float(v):.4f}" for k, v in loss_dict.items()
                    if k in ("rec_loss", "velocity_loss", "e_q_loss")))
        log(f"torch vq trained in {time.time()-t0:.0f}s")
        torch.save({"state": wrapper.state_dict(), "step": STEPS},
                   ckpt_path + ".tmp")
        os.replace(ckpt_path + ".tmp", ckpt_path)

    # Small FINAL artifact: only state.VQ (all any downstream consumer —
    # torch_config / convert_vqvae — reads), written atomically and only at
    # step==STEPS. harvest_evidence.sh commits THIS, never the ~450 MB
    # in-place-rewritten resume checkpoint (ADVICE r3).
    final_path = os.path.join(CKPT, f"torch_vq_{STEPS}_final.pth")
    if not os.path.exists(final_path):
        torch.save({"state": {"VQ": wrapper.state_dict()["VQ"]},
                    "step": STEPS}, final_path + ".tmp")
        os.replace(final_path + ".tmp", final_path)
        log(f"torch vq final artifact -> {final_path}")

    wrapper.VQ.eval()
    l1s = []
    with torch.no_grad():
        for b in evalb:
            gt = torch.from_numpy(
                fbhe(b["poses"], b["expression"]).transpose(0, 2, 1))
            _, _, rec = wrapper.VQ(gt_poses=gt, result_form="full")
            l1s.append(float((rec - gt).abs().mean()))
    return float(np.mean(l1s))


# ---------------------------------------------------------------------------

def run_jax(train, evalb):
    import jax
    import jax.numpy as jnp
    import optax

    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.train.state import create_train_state
    from probtalk_tpu.train.steps import make_vq_train_step

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    vq = VQVAE(in_dim=376, embedding_dim=512, num_codes=128, groups=4,
               hiddens=1024, res_layers=2)
    x0 = jnp.zeros((BS, WINDOW, 376), jnp.float32)
    # reference optimizer: plain Adam(1e-4, betas 0.9/0.999)
    # (vq_teacher.init_optimizer)
    # create_train_state applies the kaiming-uniform conv reinit by default
    # (train/state.torch_conv_reinit) — the parity-measured better init
    state = create_train_state(vq, (x0,), jax.random.key(0), optax.adam(LR),
                               init_kwargs={"train": True})
    step = make_vq_train_step(vq, donate=False)
    key = jax.random.key(1)
    t0 = time.time()
    for i, b in enumerate(train):
        key, k = jax.random.split(key)
        batch = {"poses_fbhe": jnp.asarray(fbhe(b["poses"], b["expression"]))}
        state, m = step(state, batch, k)
        if i % 100 == 0 or i == STEPS - 1:
            log(f"jax vq step {i}: loss={float(m['loss']):.4f} "
                f"rec={float(m['rec_loss']):.4f}")
    log(f"jax vq trained in {time.time()-t0:.0f}s")

    variables = {"params": state.params, **state.mutables}
    l1s = []
    for b in evalb:
        gt = jnp.asarray(fbhe(b["poses"], b["expression"]))
        rec, _, _ = vq.apply(variables, gt, train=False)
        l1s.append(float(jnp.mean(jnp.abs(rec - gt))))
    return float(np.mean(l1s))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    train, evalb = build_batches()
    results = {}
    if os.path.exists(OUT_JSON):
        results = json.load(open(OUT_JSON))
    results.setdefault("config", {"batch_size": BS, "window": WINDOW,
                                  "lr": LR, "optimizer": "adam",
                                  "data": "SHOW demo clips (8), shared "
                                          "bit-identical batches"})
    entry = results.setdefault(f"steps_{STEPS}", {})
    if which in ("both", "jax"):
        entry["jax_vq_capacity_l1"] = run_jax(train, evalb)
        log(f"jax capacity L1 = {entry['jax_vq_capacity_l1']:.4f}")
        json.dump(results, open(OUT_JSON, "w"), indent=2)
    if which in ("both", "torch"):
        entry["torch_vq_capacity_l1"] = run_torch(train, evalb)
        log(f"torch capacity L1 = {entry['torch_vq_capacity_l1']:.4f}")
        json.dump(results, open(OUT_JSON, "w"), indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
