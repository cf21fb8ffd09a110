"""Training CLI: config-driven stage training.

Capability of the reference's ``scripts/train.py`` + ``trainer/Trainer.py``:
``python -m probtalk_tpu.cli.train --config_file configs/vq.json`` trains the
stage named by ``Model.model_name`` on the cached dataset, data-parallel
over the device mesh.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from probtalk_tpu.cli.options import parse_args
    from probtalk_tpu.config import load_config

    args = parse_args(argv)
    config = load_config(args.config_file)

    import jax
    import jax.numpy as jnp
    from probtalk_tpu.cli.data_build import load_cached_clips
    from probtalk_tpu.data.dataset import WindowedDataset
    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.parallel import make_mesh, shard_batch, replicate
    from probtalk_tpu.train.state import create_train_state, adamw
    from probtalk_tpu.train.steps import make_vq_train_step
    from probtalk_tpu.train import stages as st
    from probtalk_tpu.train.trainer import (
        Trainer, Checkpointer, make_train_dir, setup_logging,
    )

    if args.data_root:
        config = config.replace(Data={"cache_dir": args.data_root})
    cache_dir = config.Data.get("cache_dir", "data/cache")
    clips, mean, std = load_cached_clips(cache_dir)
    window = config.Data.pose.generate_length
    ds = WindowedDataset(clips, window=window, stride=6, mean=mean, std=std)

    train_dir = make_train_dir(args.save_dir, config.Log.name, config)
    setup_logging(train_dir)

    mesh = make_mesh(data=args.num_devices)
    bs = args.batch_size or config.DataLoader.batch_size
    lr = config.Train.learning_rate.generator_learning_rate
    tx = adamw(lr, max_grad_norm=config.Train.max_gradient_norm)
    epochs = args.epochs or config.Train.epochs
    name = config.Model.model_name

    m = config.Model
    vq = VQVAE(
        in_dim=376, embedding_dim=m.get("code_dim", 128) * m.get("groups", 4),
        num_codes=m.get("code_num", 128), groups=m.get("groups", 4),
        hiddens=m.get("hiddens", 1024), res_layers=m.get("res_layers", 2),
        q_type=m.get("q_type", "pro"),
    )

    def batch_factory(epoch):
        it = ds.fbhe_batches(bs, seed=epoch, drop_remainder=True)
        for b in it:
            yield b

    sample = next(ds.fbhe_batches(min(bs, 8), seed=0))
    x0 = jnp.asarray(sample["poses_fbhe"])

    if name == "s2g_body_vqt":
        state = create_train_state(vq, (x0,), jax.random.key(0), tx,
                                   init_kwargs={"train": True})
        step = make_vq_train_step(vq)
        extra = None
    elif name == "s2g_body_predictor":
        vq_vars = _load_vq_vars(vq, m.get("vq_path"), x0)
        stage = st.PredictorStage(
            mot_dim=376, num_code=m.get("code_num", 128),
            groups=m.get("groups", 4), maskgit=m.get("maskgit", True),
            maskgit_T=m.get("maskgit_T", 8),
            motion_context=m.get("motion_context", True),
            use_audio=m.get("p_audio") is not None,
            use_text=m.get("p_text") is not None,
        )
        bs0, t0 = x0.shape[0], x0.shape[1]
        mask0 = jnp.zeros((bs0, t0, 1), jnp.float32)
        codes_t = _down3(t0)
        codes0 = jnp.zeros((bs0, codes_t, m.get("groups", 4)), jnp.int32)
        aud0 = jnp.asarray(sample["aud_feat"])
        spk0 = jnp.asarray(sample["speaker"])
        state = create_train_state(stage, (x0, codes0, mask0, spk0, aud0),
                                   jax.random.key(0), tx,
                                   init_kwargs={"train": True})
        step = st.make_predictor_train_step(stage, vq, vq_vars)
        extra = lambda epoch: {"epoch_ratio": np.float32(
            min(max(epoch / max(epochs - 1, 1), 0.5), 1.0))}
    elif name == "s2g_body_refiner":
        vq_vars = _load_vq_vars(vq, m.get("vq_path"), x0)
        stage = st.RefinerStage(in_dim=376,
                                aud_dim=sample["aud_feat"].shape[-1])
        aud0 = jnp.asarray(sample["aud_feat"])
        spk0 = jnp.asarray(sample["speaker"])
        mask0 = jnp.zeros_like(x0[..., :1])
        state = create_train_state(stage, (x0, aud0, mask0, spk0),
                                   jax.random.key(0), tx,
                                   init_kwargs={"train": True})
        step = st.make_refiner_train_step(stage, vq, vq_vars)
        extra = None
    else:
        raise SystemExit(f"unknown model_name {name}")

    state = replicate(state, mesh)
    ckpt = Checkpointer(os.path.join(train_dir, "ckpt"))
    trainer = Trainer(
        step, state, batch_factory,
        train_dir=train_dir, epochs=epochs,
        print_every=config.Log.print_every, save_every=config.Log.save_every,
        checkpointer=ckpt,
        device_put=lambda b: shard_batch(b, mesh),
        extra_batch_keys=extra,
    )
    if args.resume:
        trainer.resume()
    trainer.train()


def _down3(n):
    for _ in range(3):
        n = (n - 2) // 2 + 1
    return n


def _load_vq_vars(vq, vq_path, x0):
    """Frozen-VQ loading (reference predictor.py:81-83). Falls back to fresh
    init when no checkpoint exists (shape-complete dry runs)."""
    import jax
    from probtalk_tpu.train.trainer import Checkpointer
    from probtalk_tpu.train.state import create_train_state, adamw

    tmpl = create_train_state(vq, (x0[:1],), jax.random.key(9), adamw(1e-4),
                              init_kwargs={"train": True})
    if vq_path and os.path.exists(vq_path):
        ckpt = Checkpointer(vq_path)
        restored, _ = ckpt.restore(tmpl)
        if restored is not None:
            tmpl = restored
    return {"params": tmpl.params, **tmpl.mutables}


if __name__ == "__main__":
    main()
