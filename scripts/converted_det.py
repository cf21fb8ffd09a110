"""Deterministic converted-checkpoint equivalence proof (VERDICT r4 item 3).

PARITY_FGD.json's converted-checkpoint arm compares stochastically sampled
generations, so its fgd_bh gap (3.31 vs 2.73) could only be *argued* to be
sampling noise. This script replaces that argument with a noise-free bound
on the SAME trained torch checkpoints (parity campaign, 600-step wrappers +
1500-step VQ teacher), converted through convert/torch_checkpoint:

  (a) GREEDY DECODE — both systems decode the same 180-frame window with
      ``sample_max`` (reference PTransformer.py:644-655: all tokens masked,
      one forward, argmax): identical weights + identical inputs must give
      (near-)identical code sequences, then (near-)identical motion through
      VQ-decode + refiner. Reported: per-token code agreement, and motion
      max/mean-abs delta over the full window.
  (b) FIXED CODES — one shared rng-fixed code sequence pushed through both
      systems' PQ-decode (+ linear resize) and refiner stacks: a pure
      numerics bound on the decode path with the sampler removed entirely.

Both run the complete inference composition the production path uses
(reference predictor.py:398-447 / refiner.py:512-558 vs the jax stages),
not isolated modules — the module-level golden tests already pin those.

Writes CONVERTED_DET.json and FAILS (exit 1) if any delta exceeds the
stated tolerance. CPU by default (bit-stability; the TPU belongs to the
round's campaign queue).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

if not os.environ.get("CONVERTED_E2E_TPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

_spec = importlib.util.spec_from_file_location(
    "parity_full_campaign",
    os.path.join(REPO, "scripts", "parity_full_campaign.py"))
pfc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pfc)

WINDOW = 180
# Tolerances (f32, CPU): module goldens pass at 1e-4; through the full
# 6-layer decoder + refiner composition, accumulated reassociation drift
# is bounded well under 1e-2 in normalized motion units (std=1 space).
TOL_MOTION = 1e-2       # max-abs normalized-motion delta, both checks
TOL_AGREE = 0.995       # greedy per-token code agreement


def load_wrapper(kind, mod_name):
    import torch
    from reference_loader import ref_import

    cfg = pfc.torch_config()
    mod = ref_import(mod_name)
    torch.manual_seed(0)
    w = mod.TrainWrapper(pfc.make_args(infer=True), cfg)
    w.device = torch.device("cpu")
    for name in (f"torch_{kind}_{pfc.STEPS}_final.pth",
                 f"torch_{kind}_{pfc.STEPS}.pth"):
        path = os.path.join(pfc.DIR, name)
        if os.path.exists(path):
            ck = torch.load(path, map_location="cpu", weights_only=False)
            assert ck["step"] >= pfc.STEPS, (name, ck["step"])
            w.load_state_dict(ck["state"])
            return w, ck
    raise FileNotFoundError(f"no complete torch_{kind} checkpoint")


def state_of(variables) -> types.SimpleNamespace:
    mut = {}
    if variables.get("batch_stats"):
        mut["batch_stats"] = variables["batch_stats"]
    return types.SimpleNamespace(params=variables["params"], mutables=mut)


def main():
    import jax
    import jax.numpy as jnp
    import torch

    from probtalk_tpu.convert.torch_checkpoint import (
        convert_predictor_stage, convert_refiner_stage, convert_vqvae,
    )
    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.train.stages import PredictorStage, RefinerStage
    from probtalk_tpu.utils.interp import resize_time

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    # ---- torch side: the reference's own wrappers on the trained ckpts
    pred_w, pred_ck = load_wrapper("pred", "nets.inpainting.predictor")
    ref_w, ref_ck = load_wrapper("ref", "nets.inpainting.refiner")
    pfc.log("torch wrappers loaded (infer mode)")

    # ---- jax side: the SAME checkpoints through the golden converters
    saved_vq = pfc.load_torch_vq()
    vq = VQVAE(in_dim=376, embedding_dim=512, num_codes=128, groups=4,
               hiddens=1024, res_layers=2)
    vq_vars = jax.tree.map(jnp.asarray, convert_vqvae(saved_vq["state"]["VQ"]))
    pred = PredictorStage(mot_dim=376, num_code=128, groups=4, aud_dim=768)
    ref = RefinerStage(in_dim=376, aud_dim=768)
    pstate = state_of(jax.tree.map(jnp.asarray,
                                   convert_predictor_stage(pred_ck["state"])))
    rstate = state_of(jax.tree.map(jnp.asarray,
                                   convert_refiner_stage(ref_ck["state"])))
    pvars = {"params": pstate.params, **pstate.mutables}
    rvars = {"params": rstate.params, **rstate.mutables}
    pfc.log("checkpoints converted -> jax stages")

    # ---- one fixed 180-frame window from the first demo clip
    clips, mean, std, _ = pfc.load_data()
    clip = clips[0]
    from probtalk_tpu.core import body_parts

    idx = body_parts.c_index(True)
    full = (np.concatenate([clip.poses, clip.expression], -1) - mean) / std
    gt = np.concatenate([full[:, :6], full[:, :330][:, idx], full[:, 330:]],
                        -1)[:WINDOW]                       # (T, 376)
    aud = clip.aud_feat[:WINDOW].astype(np.float32)        # (T, 768)
    spk = int(clip.speaker)

    aud_t = torch.from_numpy(aud.T[None])                  # (1, Ca, T)
    text_t = torch.zeros((1, 768, WINDOW))
    gt_t = torch.from_numpy(gt.T[None].astype(np.float32))  # (1, C, T)
    mask_t = torch.zeros((1, 1, WINDOW))
    id_t = torch.tensor([spk])

    report = {"window": WINDOW, "clip": clip.name, "speaker": spk,
              "torch_steps": pfc.STEPS, "tol_motion": TOL_MOTION,
              "tol_agree": TOL_AGREE}

    # ================= check (a): greedy decode =================
    # Swap the wrapper's stochastic MaskGit sampler for the reference's own
    # deterministic sample_max, capturing the emitted codes.
    dec = pred_w.Predictor.decoder
    captured = {}

    def greedy(label=None, condition=None, input_codes=None, T=10,
               mode="cosine"):
        ids = dec.sample_max(label=label, condition=condition)
        captured["codes"] = ids.detach().cpu().numpy()
        return ids

    dec.sample_good = greedy
    with torch.no_grad():
        p0, _ = pred_w.infer_on_batch(aud=aud_t, text=text_t, id=id_t, B=1,
                                      gt_poses=gt_t, mask=mask_t)
        r0, _ = ref_w.infer_on_batch(aud=aud_t, B=1, id=id_t, gt_poses=gt_t,
                                     mask=mask_t, pred_poses=p0)
    torch_codes = captured["codes"].reshape(1, -1, 4)
    torch_motion = r0.numpy().transpose(0, 2, 1)           # (1, T, C)
    pfc.log(f"torch greedy: codes {torch_codes.shape} "
            f"motion {torch_motion.shape}")

    x0 = jnp.zeros((1, WINDOW, 376), jnp.float32)
    m0 = jnp.zeros((1, WINDOW, 1), jnp.float32)
    aud_j = jnp.asarray(aud)[None]
    spk_j = jnp.full((1,), spk, jnp.int32)

    @jax.jit
    def jax_greedy(pv, rv, vv, aud, spk):
        codes = pred.apply(pv, x0, m0, spk, aud, method=pred.sample_max)
        prelim = vq.apply(vv, codes, train=False, method=vq.decode_codes)
        prelim = resize_time(prelim, WINDOW)
        out = ref.apply(rv, prelim, aud, m0, spk, train=False)
        return codes, out

    jax_codes, jax_motion = jax.tree.map(
        np.asarray, jax_greedy(pvars, rvars, vq_vars, aud_j, spk_j))
    agree = float((jax_codes == torch_codes).mean())
    d = np.abs(jax_motion - torch_motion)
    report["greedy"] = {
        "code_agreement": round(agree, 6),
        "n_codes": int(torch_codes.size),
        "motion_max_abs": round(float(d.max()), 6),
        "motion_mean_abs": round(float(d.mean()), 8),
    }
    pfc.log(f"greedy: agreement {agree:.4f} "
            f"motion max|d| {d.max():.2e} mean|d| {d.mean():.2e}")

    # ================= check (b): fixed codes =================
    rng = np.random.default_rng(0)
    codes_fix = rng.integers(0, 128, size=(1, torch_codes.shape[1], 4))
    codes_t = torch.from_numpy(codes_fix.astype(np.int64))
    with torch.no_grad():
        q = pred_w.VQ.vq_layer.quantize_all(codes_t)       # (1, Tc, D)
        dec_t = pred_w.VQ.decode(q.transpose(1, 2), None)  # (1, C, Tc*8)
        dec_t = torch.nn.functional.interpolate(
            dec_t, size=WINDOW, mode="linear")             # predictor.py:444
        rfix, _ = ref_w.infer_on_batch(aud=aud_t, B=1, id=id_t,
                                       gt_poses=gt_t, mask=mask_t,
                                       pred_poses=dec_t)
    torch_dec = dec_t.numpy().transpose(0, 2, 1)
    torch_ref = rfix.numpy().transpose(0, 2, 1)

    @jax.jit
    def jax_fixed(rv, vv, codes, aud, spk):
        prelim = vq.apply(vv, codes, train=False, method=vq.decode_codes)
        prelim = resize_time(prelim, WINDOW)
        out = ref.apply(rv, prelim, aud, m0, spk, train=False)
        return prelim, out

    jax_dec, jax_ref = jax.tree.map(
        np.asarray,
        jax_fixed(rvars, vq_vars, jnp.asarray(codes_fix, jnp.int32),
                  aud_j, spk_j))
    dd, dr = np.abs(jax_dec - torch_dec), np.abs(jax_ref - torch_ref)
    report["fixed_codes"] = {
        "decode_max_abs": round(float(dd.max()), 6),
        "decode_mean_abs": round(float(dd.mean()), 8),
        "refined_max_abs": round(float(dr.max()), 6),
        "refined_mean_abs": round(float(dr.mean()), 8),
    }
    pfc.log(f"fixed codes: decode max|d| {dd.max():.2e} "
            f"refined max|d| {dr.max():.2e}")

    ok = (report["greedy"]["code_agreement"] >= TOL_AGREE
          and report["greedy"]["motion_max_abs"] <= TOL_MOTION
          and report["fixed_codes"]["decode_max_abs"] <= TOL_MOTION
          and report["fixed_codes"]["refined_max_abs"] <= TOL_MOTION)
    report["pass"] = bool(ok)
    out = os.path.join(REPO, "CONVERTED_DET.json")
    json.dump(report, open(out + ".tmp", "w"), indent=2)
    os.replace(out + ".tmp", out)
    pfc.log(f"wrote {out} pass={ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
