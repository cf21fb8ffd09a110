"""VQ reconstruction 'capacity' evaluation.

Capability of the reference's ``scripts/test_vq.py``: reconstruct held-out
clips through the trained PQ-VAE and report per-clip L1 (the 'capacity'
number at test_vq.py:54).
"""

from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    from probtalk_tpu.cli.options import parse_args
    from probtalk_tpu.config import load_config

    args = parse_args(argv)
    config = load_config(args.config_file)

    import jax
    import jax.numpy as jnp
    from probtalk_tpu.cli.data_build import load_cached_clips
    from probtalk_tpu.core import body_parts
    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.train.state import create_train_state, adamw
    from probtalk_tpu.train.steps import make_eval_recon_fn
    from probtalk_tpu.train.trainer import Checkpointer

    m = config.Model
    vq = VQVAE(
        in_dim=376, embedding_dim=m.get("code_dim", 128) * m.get("groups", 4),
        num_codes=m.get("code_num", 128), groups=m.get("groups", 4),
        hiddens=m.get("hiddens", 1024), res_layers=m.get("res_layers", 2),
        q_type=m.get("q_type", "pro"),
    )
    clips, mean, std = load_cached_clips(config.Data.get("cache_dir", "data/cache"))

    window = config.Data.pose.generate_length
    x0 = jnp.zeros((1, window, 376), jnp.float32)
    state = create_train_state(vq, (x0,), jax.random.key(0), adamw(1e-4),
                               init_kwargs={"train": True})
    if args.model_path:
        ckpt = Checkpointer(args.model_path)
        restored, ep = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"loaded epoch {ep} from {args.model_path}")

    recon = make_eval_recon_fn(vq)
    jaw_d = body_parts.each_dim(True)[0]
    idx = body_parts.c_index(True)

    total, n = 0.0, 0
    for clip in clips:
        t = (clip.poses.shape[0] // window) * window
        if t == 0:
            continue
        full = np.concatenate([clip.poses, clip.expression], -1)
        full = (full - mean) / std
        poses, expr = full[:t, :330], full[:t, 330:]
        fbhe = np.concatenate([poses[:, :jaw_d], poses[:, idx], expr], -1)
        x = jnp.asarray(fbhe.reshape(-1, window, 376))
        _, l1, _ = recon(state, x)
        print(f"{clip.name}: capacity L1 = {float(l1):.4f}")
        total += float(l1)
        n += 1
    if n:
        print(f"mean capacity L1 over {n} clips: {total / n:.4f}")


if __name__ == "__main__":
    main()
