"""Inpainting demo CLI: generate motion conditioned on known GT frames.

Capability of the reference's ``scripts/visualise_inpaint.py:132-400``:
keep the first/last ``--pre_frames`` GT frames (and optionally random
interior frames) as known context, inpaint the rest with the masked
predictor + refiner, and save GT-vs-generated motion (plus a skeleton or
mesh video when an SMPL-X asset is available).

    python -m probtalk_tpu.cli.visualise_inpaint \
        --config_file configs/transformer.json \
        --data_root /root/reference/demo_audio --num_sample 4
"""

from __future__ import annotations

import os

import numpy as np


def build_inpaint_mask(t: int, pre_frames: int = 30,
                       interior_keep: float = 0.0, rng=None) -> np.ndarray:
    """(T, 1) known-context mask: first/last ``pre_frames`` are 1 (known),
    interior frames kept with probability ``interior_keep`` (the
    bernoulli head/body/tail mask of visualise_inpaint.py:179-183)."""
    mask = np.zeros((t, 1), np.float32)
    mask[:pre_frames] = 1.0
    mask[t - pre_frames:] = 1.0
    if interior_keep > 0 and rng is not None:
        keep = rng.random(t - 2 * pre_frames) < interior_keep
        mask[pre_frames: t - pre_frames, 0] = keep.astype(np.float32)
    return mask


def inpaint_clip(pipe, clip, mean, std, B: int = 4, pre_frames: int = 30,
                 interior_keep: float = 0.0, seed: int = 0):
    """-> (B, T, 376) normalized fbhe with GT frames passed through."""
    import jax
    import jax.numpy as jnp
    from probtalk_tpu.core import body_parts

    poses, expr = clip.poses, clip.expression
    full = (np.concatenate([poses, expr], -1) - mean) / std
    gt_fbhe = np.asarray(body_parts.compose_fbhe(
        jnp.asarray(full[:, :330]), jnp.asarray(full[:, 330:])))
    t = gt_fbhe.shape[0]
    w = pipe.window

    rng = np.random.default_rng(seed)
    mask_np = build_inpaint_mask(t, pre_frames, interior_keep, rng)
    ctx = jnp.asarray(np.tile(gt_fbhe[None] * mask_np[None], (B, 1, 1)))
    mask = jnp.asarray(np.tile(mask_np[None], (B, 1, 1)))
    aud = jnp.asarray(clip.aud_feat)[None].repeat(B, 0)
    speaker = jnp.full((B,), int(clip.speaker), jnp.int32)

    outputs = np.zeros((B, t, gt_fbhe.shape[-1]), np.float32)
    key = jax.random.key(seed)
    pos = 0
    while pos < t:
        key, k = jax.random.split(key)
        end = min(pos + w, t)
        take = end - pos

        def pad(x):
            if take == w:
                return x[:, pos:end]
            p = jnp.zeros((B, w - take) + x.shape[2:], x.dtype)
            return jnp.concatenate([x[:, pos:end], p], axis=1)

        refined, _, _ = pipe.generate_window(
            k, pad(aud), speaker, pad(ctx), pad(mask))
        outputs[:, pos:end] = np.asarray(refined[:, :take])
        pos += w
    # known frames pass through exactly (reference blends with mask)
    outputs = gt_fbhe[None] * mask_np[None] + outputs * (1 - mask_np[None])
    return outputs, gt_fbhe, mask_np


def main(argv=None):
    from probtalk_tpu.cli.data_build import build_cache, load_cached_clips
    from probtalk_tpu.cli.demo import build_pipeline
    from probtalk_tpu.cli.options import parse_args
    from probtalk_tpu.config import load_config
    from probtalk_tpu.eval.harness import fbhe_to_full_motion

    args = parse_args(argv)
    config = load_config(args.config_file)
    data_root = args.data_root or "/root/reference/demo_audio"
    cache_dir = os.environ.get("PROBTALK_CACHE", "/tmp/ptlk_cache")
    hand = os.environ.get("PROBTALK_HAND_COMPONENT",
                          "/root/reference/data_utils/hand_component.json")
    build_cache(data_root, cache_dir, args.speakers, hand,
                audio_feat=config.Data.aud.get("feat_method", "mfcc"),
                audio_feat_dim=config.Data.aud.get("aud_feat_dim", 64))
    clips, mean, std = load_cached_clips(cache_dir)
    if not clips:
        raise SystemExit(f"no clips under {data_root}")

    body_paths = args.body_model_path or [None, None]
    pipe, _, _ = build_pipeline(
        config, os.environ.get("PROBTALK_NORM_STATS",
                               "/root/reference/data_utils/norm_stats.npy"),
        vq_path=args.model_path, predictor_path=body_paths[0],
        refiner_path=body_paths[1] if len(body_paths) > 1 else None)

    out_dir = os.path.join(args.save_dir, "inpaint")
    os.makedirs(out_dir, exist_ok=True)
    clip = clips[0]
    gen, gt, mask = inpaint_clip(pipe, clip, mean, std,
                                 B=max(args.num_sample, 1))
    motion = fbhe_to_full_motion(gen, mean, std, stand=args.stand)
    np.save(os.path.join(out_dir, f"{clip.name}_inpaint.npy"), motion)
    np.save(os.path.join(out_dir, f"{clip.name}_mask.npy"), mask)
    print(f"inpainted {motion.shape} (known frames: {int(mask.sum())}/"
          f"{mask.shape[0]}) -> {out_dir}")


if __name__ == "__main__":
    main()
