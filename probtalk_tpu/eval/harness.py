"""Holistic evaluation harness: the complete metric suite of the
reference's ``scripts/test_holisticbody.py:98-369``.

Per test clip (whole-clip, B=16 diversity samples):
  * generation fps (generator time only, reference line 369)
  * FGD over 90-frame normalized-fbhe windows, three embedders (fe/bh/fbhe)
  * body metrics on SMPL-X joints: MAD (batch LVD), MAJE, diversity over
    the 22 body joints, plus the *_full variants over joints [0:22]+[23:74]
    (reference body_loss, lines 116-139)
  * face metrics on a second SMPL-X pass with the body pose zeroed:
    face_L2 (jaw + landmark distances), face_LVD, face_diverse
    (reference face_loss_diverse, lines 98-110)
  * MAAC over GT joints, beat consistency (thres 0.01) vs audio onsets

TPU-first layout: generation runs through the compiled streaming scan
(``streaming.make_streaming_generate``) so a whole clip is ONE XLA program;
SMPL-X joints run as one jitted batched forward per (padded) clip — frames
are independent, so time-padding to a bucket is exact and caps compiles.
Metric reductions are host-side numpy (tiny), matching the reference math
bit-for-bit in float64.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from probtalk_tpu.eval import metrics as M
from probtalk_tpu.smplx.lbs import BODY_JOINT_IND, FACE_JOINT_IND, FULL_JOINT_IND

# GT variance normalizers — dataset-statistic fixtures hard-coded by the
# reference (test_holisticbody.py:33-36)
FACE_TVAR = 0.00070697901537641883
FACE_TSUM = 0.00109510007314383984
BODY_TVAR = 0.98894238471984863281
BODY_TSUM = 1.60230898857116699219

EXP_DIM = 100


def _cget(clip, key, default=None):
    """Field access for dict clips and ClipData dataclasses alike."""
    if isinstance(clip, dict):
        return clip.get(key, default)
    return getattr(clip, key, default)


def unfold_windows(x: np.ndarray, size: int = 90, step: int = 90) -> np.ndarray:
    """(..., T, C) -> (... * N, size, C) windows (the 90-frame unfolds of
    test_holisticbody.py:279)."""
    t = x.shape[-2]
    n = max((t - size) // step + 1, 0)
    if n == 0:
        return np.zeros((0, size, x.shape[-1]), x.dtype)
    w = np.stack([x[..., i * step: i * step + size, :] for i in range(n)], -3)
    return w.reshape(-1, size, x.shape[-1])


def _pad_bucket(t: int, bucket: int = 64) -> int:
    return -(-t // bucket) * bucket


# canonical barrier lives in utils.profiling; re-exported here for the
# many round-1/2 call sites that import it from the harness
from probtalk_tpu.utils.profiling import device_sync  # noqa: F401,E402


def make_joints_fn(smplx_model, bucket: int = 64):
    """-> joints(full_motion (B, T, 165+100), betas=None) -> (B, T, J, 3).

    ``betas``: the clip's SMPL-X shape coefficients (the reference
    evaluates with each clip's own betas, test_holisticbody.py:292-299);
    None means the neutral shape. Jitted per padded length; SMPL-X is
    per-frame so edge-padding then cropping is exact.
    """
    import jax
    import jax.numpy as jnp
    from probtalk_tpu.smplx.lbs import smplx_joints

    # model passed as argument (closure constants serialize into the HLO)
    @jax.jit
    def _joints(model, betas, pred):
        return smplx_joints(model, betas, pred)

    def joints(full_motion: np.ndarray, betas=None) -> np.ndarray:
        b, t, c = full_motion.shape
        if betas is None:
            bet = jnp.zeros((300,), jnp.float32)
        else:
            bet = jnp.asarray(np.asarray(betas, np.float32).reshape(-1))
        tp = _pad_bucket(t, bucket)
        if tp != t:
            pad = np.repeat(full_motion[:, -1:], tp - t, axis=1)
            full_motion = np.concatenate([full_motion, pad], axis=1)
        out = np.asarray(_joints(smplx_model, bet, jnp.asarray(full_motion)))
        return out[:, :t]

    return joints


# ---------------------------------------------------------------------------
# reference metric formulas (host numpy, float64)
# ---------------------------------------------------------------------------

def body_metrics(gt_joints: np.ndarray, pred_joints: np.ndarray) -> dict:
    """gt (T, J, 3), pred (B, T, J, 3) -> the body_loss dict
    (test_holisticbody.py:116-139)."""
    gt = np.asarray(gt_joints, np.float64)
    pr = np.asarray(pred_joints, np.float64)
    out = {}
    for tag, ind, tvar in (("", BODY_JOINT_IND, None),
                           ("_full", FULL_JOINT_IND, BODY_TVAR)):
        g, p = gt[:, ind], pr[:, :, ind]
        out["MAD" + tag] = M.batch_lvd(g, p)
        dist = np.linalg.norm(g[None] - p, axis=-1)          # (B, T, J)
        out["MAJE" + tag] = float(dist.sum(-1).mean())
        var = np.linalg.norm(p.var(axis=0, ddof=1), axis=-1)  # (T, J)
        div = float(var.sum(-1).mean())
        out["diverse" + tag] = div / tvar if tvar else div
    return out


def face_metrics(gt_joints: np.ndarray, pred_joints: np.ndarray) -> dict:
    """Joints from the zeroed-body SMPL-X pass: gt (T, J, 3),
    pred (B, T, J, 3) -> face_loss_diverse dict
    (test_holisticbody.py:98-110)."""
    gt = np.asarray(gt_joints, np.float64)
    pr = np.asarray(pred_joints, np.float64)
    jaw = np.linalg.norm(gt[None, :, 22:23] - pr[:, :, 22:23], axis=-1)
    lmk = np.linalg.norm(gt[None, :, 74:] - pr[:, :, 74:], axis=-1)
    face_l2 = float(lmk.sum(-1).mean() + jaw.sum(-1).mean())

    face_gt = np.concatenate([gt[:, 22:25], gt[:, 74:]], axis=1)
    face_pr = np.concatenate([pr[:, :, 22:25], pr[:, :, 74:]], axis=2)
    face_lvd = M.batch_lvd(face_gt, face_pr)

    var = np.linalg.norm(pr[:, :, FACE_JOINT_IND].var(axis=0, ddof=1), axis=-1)
    face_div = float(var.sum(-1).mean()) / FACE_TVAR
    return {"face_L2": face_l2, "face_LVD": face_lvd, "face_diverse": face_div}


# ---------------------------------------------------------------------------

def prepare_gt(clip: dict, mean: np.ndarray, std: np.ndarray):
    """-> (gt_fbhe_norm (T, 376), gt_full_3d (T, 265)).

    gt_fbhe_norm: normalized [jaw | c_index | expression] for FGD windows;
    gt_full_3d: raw axis-angle 165 + expression with the canned lower body
    (poses2pred) for SMPL-X metrics.
    """
    import jax.numpy as jnp
    from probtalk_tpu.core import body_parts
    from probtalk_tpu.data.preprocess import pose_6d_to_3d

    poses, expr = _cget(clip, "poses"), _cget(clip, "expression")
    full = np.concatenate([poses, expr], -1)
    norm = (full - mean) / std
    gt_fbhe = np.asarray(body_parts.compose_fbhe(
        jnp.asarray(norm[:, :330]), jnp.asarray(norm[:, 330:])))

    pose_3d = pose_6d_to_3d(poses) if poses.shape[-1] == 330 else poses
    pose_3d = np.asarray(body_parts.poses2pred(jnp.asarray(pose_3d)))
    gt_full = np.concatenate([pose_3d, expr], -1).astype(np.float32)
    return gt_fbhe, gt_full


def fbhe_to_full_motion(out_norm: np.ndarray, mean, std, stand: bool = False):
    """(B, T, 376) normalized fbhe -> (B, T, 265) axis-angle+expression with
    the canned lower body spliced back (demo.py:199-205 equivalent)."""
    import jax.numpy as jnp
    from probtalk_tpu.core import body_parts, normalize
    from probtalk_tpu.core.rotation import d6_to_aa_flat

    idx = body_parts.c_index(True)
    den = normalize.denormalize(jnp.asarray(out_norm), mean, std,
                                shape="fbhe", idx=idx)
    b, t, _ = den.shape
    aa = d6_to_aa_flat(den[..., :276].reshape(-1, 276)).reshape(b, t, 138)
    full = body_parts.part2full(aa, stand=stand)
    return np.asarray(jnp.concatenate([full, den[..., -EXP_DIM:]], -1))


def run_harness(generate_fn, clips, mean, std, evaluator=None,
                smplx_model=None, B: int = 16, seed: int = 0,
                stand: bool = False, verbose: bool = True,
                warmup: bool = True) -> dict:
    """Evaluate a generator over whole test clips.

    generate_fn(key, aud (B, T, Ca), speaker (B,)) -> (B, T, 376) normalized
    fbhe motion (e.g. ``streaming.make_streaming_generate(...)``).
    clips: dicts with 'poses' (T,330), 'expression' (T,100), 'aud_feat'
    (T,Ca), 'speaker' int, optional 'onset_times' (seconds).
    """
    import jax
    import jax.numpy as jnp

    key = jax.random.key(seed)
    mean = np.asarray(mean, np.float32).reshape(-1)
    std = np.asarray(std, np.float32).reshape(-1)
    joints_fn = make_joints_fn(smplx_model) if smplx_model is not None else None

    loss_sums: dict = {}
    div_fbhe, total_frames, total_gen_frames, gen_time = [], 0, 0, 0.0
    n_clips = 0

    if warmup and clips:
        # compile outside the timed region: fps measures steady-state
        # serving (the torch reference has no compile step to amortize)
        for tw in sorted({c.aud_feat.shape[0] if not isinstance(c, dict)
                          else c["aud_feat"].shape[0] for c in clips}):
            aud0 = jnp.zeros((B, tw, np.asarray(
                _cget(clips[0], "aud_feat")).shape[-1]), jnp.float32)
            device_sync(generate_fn(key, aud0, jnp.zeros((B,), jnp.int32)))

    for clip in clips:
        key, k = jax.random.split(key)
        gt_fbhe, gt_full = prepare_gt(clip, mean, std)
        t = gt_fbhe.shape[0]
        aud = jnp.asarray(_cget(clip, "aud_feat"))[None].repeat(B, 0)
        speaker = jnp.full((B,), int(_cget(clip, "speaker", 0)), jnp.int32)

        # time to device-completion only — the reference's cost_time is a
        # cuda-synchronized generator measurement with the result left on
        # device (predictor.py:423-443); the bulk host copy for metric
        # computation below is not part of generation. device_sync (scalar
        # fetch) is the completion barrier — block_until_ready does not
        # block on the axon backend.
        t0 = time.perf_counter()
        out_dev = generate_fn(k, aud, speaker)
        device_sync(out_dev)
        dt = time.perf_counter() - t0
        out = np.asarray(out_dev)
        total_frames += t
        total_gen_frames += B * t
        gen_time += dt

        out = out[:, :t]
        div_fbhe.append(M.diversity(out))
        if evaluator is not None:
            gen_w = unfold_windows(out)
            real_w = unfold_windows(gt_fbhe)
            if len(gen_w) and len(real_w):
                evaluator.push_samples(gen_w, real_w)

        bat = {}
        if joints_fn is not None:
            # the clip's own betas shape the joints (reference harness,
            # test_holisticbody.py:292-299); neutral when absent
            clip_betas = _cget(clip, "betas")
            pred_full = fbhe_to_full_motion(out, mean, std, stand=stand)
            pred_joints = joints_fn(pred_full, clip_betas)
            gt_joints = joints_fn(gt_full[None], clip_betas)[0]
            bat.update(body_metrics(gt_joints, pred_joints))

            # face pass: zero everything but jaw + expression
            # (test_holisticbody.py:334-339)
            def face_param(x):
                z = np.zeros_like(x[..., 3:165])
                return np.concatenate([x[..., :3], z, x[..., 165:]], -1)

            pf_joints = joints_fn(face_param(pred_full), clip_betas)
            gf_joints = joints_fn(face_param(gt_full)[None], clip_betas)[0]
            bat.update(face_metrics(gf_joints, pf_joints))

            if evaluator is not None:
                evaluator.push_joints(pred_joints, gt_joints)
                onsets = _cget(clip, "onset_times")
                if onsets is not None:
                    evaluator.push_aud(np.asarray(onsets))

        for kk, v in bat.items():
            loss_sums[kk] = loss_sums.get(kk, 0.0) + v
        n_clips += 1
        if verbose:
            msg = ", ".join(f"{kk}={v:.4f}" for kk, v in bat.items())
            print(f"clip {n_clips}: T={t}, gen {dt*1000:.0f} ms"
                  + (f", {msg}" if msg else ""))

    results = {"clips": n_clips}
    for kk, v in loss_sums.items():
        results[kk] = v / max(n_clips, 1)
    results["diversity_fbhe"] = float(np.mean(div_fbhe)) if div_fbhe else 0.0
    # reference fps counts one clip-length per clip, generator time only
    # (test_holisticbody.py:264-265,369)
    results["fps"] = total_frames / max(gen_time, 1e-9)
    results["frames_per_sec_total"] = total_gen_frames / max(gen_time, 1e-9)

    if evaluator is not None and n_clips:
        for which in ("fe", "bh", "fbhe"):
            if which in evaluator.extract_fns:
                fd, fl1 = evaluator.get_scores(which)
                results[f"fgd_{which}"] = fd
                results[f"featdist_{which}"] = fl1
        if evaluator.real_joints:
            maac = evaluator.get_maac()
            results["MAAC"] = [float(x) for x in np.atleast_1d(maac)]
            if evaluator.audio_beats:
                results["BC"] = evaluator.get_bc_score(0.01, maac)
    return results
