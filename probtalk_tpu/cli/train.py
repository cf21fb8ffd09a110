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
    elif name == "s2g_face":
        from probtalk_tpu.models.face import FaceGenerator
        from probtalk_tpu.train import stages_extra as se
        from probtalk_tpu.core import body_parts

        jaw_d = body_parts.each_dim(True)[0]
        stage = FaceGenerator()
        aud0 = jnp.asarray(sample["aud_feat"])
        spk0 = jnp.asarray(sample["speaker"])
        state = create_train_state(stage, (aud0, spk0), jax.random.key(0), tx,
                                   init_kwargs={"train": True})
        step = _with_face_gt(se.make_face_train_step(stage), jaw_d)
        extra = None
    elif name == "emb_net":
        from probtalk_tpu.models.embedding_net import EmbeddingNet
        from probtalk_tpu.train import stages_extra as se

        stage = EmbeddingNet(pose_dim=x0.shape[-1], n_frames=window)
        state = create_train_state(stage, (x0,), jax.random.key(0), tx,
                                   init_kwargs={"train": True})
        emb_step = se.make_embedder_train_step(stage)
        step = lambda s, b, k: emb_step(s, {"windows": b["poses_fbhe"]}, k)
        extra = None
    elif name == "s2g_body_vq":
        from probtalk_tpu.models.legacy import LegacyVQVAE
        from probtalk_tpu.train import stages_extra as se
        from probtalk_tpu.core import body_parts

        jaw_d = body_parts.each_dim(True)[0]
        bh0 = x0[..., jaw_d:-100]
        stage = LegacyVQVAE(in_dim=int(bh0.shape[-1]),
                            num_codes=m.get("code_num", 2048))
        state = create_train_state(stage, (bh0,), jax.random.key(0), tx,
                                   init_kwargs={"train": True})
        vq_step = se.make_legacy_vq_train_step(stage)
        step = lambda s, b, k: vq_step(
            s, {"motion": b["poses_fbhe"][..., jaw_d:-100]}, k)
        extra = None
    elif name == "s2g_body_pixel":
        from probtalk_tpu.models.legacy import LegacyVQVAE, GatedPixelCNN2D
        from probtalk_tpu.train import stages_extra as se
        from probtalk_tpu.core import body_parts

        jaw_d = body_parts.each_dim(True)[0]
        bh0 = x0[..., jaw_d:-100]
        # body/hand part split (reference smplx_body_vq composition=True)
        body_d = body_parts.each_dim(True)[1]
        lvq = LegacyVQVAE(in_dim=int(bh0.shape[-1]) // 2,
                          num_codes=m.get("code_num", 2048))
        lvq_vars = _load_legacy_vq_vars(lvq, m.get("vq_path"),
                                        bh0[..., : bh0.shape[-1] // 2])
        stage = GatedPixelCNN2D(num_codes=m.get("code_num", 2048))
        spk0 = jnp.asarray(sample["speaker"])
        aud0 = jnp.asarray(sample["aud_feat"])
        aud_cr0 = aud0[:, :: 4]
        codes0 = jnp.zeros((x0.shape[0], x0.shape[1] // 4, 2), jnp.int32)
        state = create_train_state(stage, (codes0, spk0, aud_cr0),
                                   jax.random.key(0), tx)
        px_step = se.make_pixelcnn_train_step(stage, lvq, lvq_vars)
        half = int(bh0.shape[-1]) // 2

        def step(s, b, k, _half=half, _jaw=jaw_d):
            bh = b["poses_fbhe"][..., _jaw:-100]
            return px_step(s, {"body": bh[..., :_half],
                               "hand": bh[..., _half:],
                               "aud_code_rate": b["aud_feat"][:, ::4],
                               "speaker": b["speaker"]}, k)

        extra = None
    elif name in ("speech2gesture", "s2g_LS3DCG"):
        from probtalk_tpu.models.legacy import (
            LS3DCG, Speech2GestureD, Speech2GestureG,
        )
        from probtalk_tpu.train import stages_extra as se

        aud0 = jnp.asarray(sample["aud_feat"])
        if name == "speech2gesture":
            gen = Speech2GestureG(out_dim=x0.shape[-1])
        else:
            gen = LS3DCG(out_dim=x0.shape[-1])
        disc = Speech2GestureD()
        g_state = create_train_state(gen, (aud0,), jax.random.key(0), tx,
                                     init_kwargs={"train": True})
        d_state = create_train_state(disc, (x0,), jax.random.key(1), tx,
                                     init_kwargs={"train": True})
        gan = m.get("gan", False)
        g_step, d_step = se.make_gan_train_steps(
            gen, disc, gan_weight=1.0 if gan else 0.0)
        state, step, extra = _gan_composite(g_state, d_state, g_step, d_step,
                                            gan)
    elif name == "s2g_body_ae":
        from probtalk_tpu.models.legacy import BodyAE
        from probtalk_tpu.train import stages_extra as se
        from probtalk_tpu.core import body_parts

        jaw_d = body_parts.each_dim(True)[0]
        bh0 = x0[..., jaw_d:-100]
        stage = BodyAE(in_dim=int(bh0.shape[-1]))
        state = create_train_state(stage, (bh0,), jax.random.key(0), tx,
                                   init_kwargs={"train": True})
        ae_step = se.make_body_ae_train_step(stage)
        step = lambda s, b, k: ae_step(
            s, {"motion": b["poses_fbhe"][..., jaw_d:-100]}, k)
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


def _with_face_gt(face_step, jaw_d):
    """Adapt fbhe batches to the face step's {'aud_feat','face_gt','speaker'}
    contract (face part = jaw 6d + 100-d expression)."""
    import jax.numpy as jnp

    def step(state, batch, rng):
        x = batch["poses_fbhe"]
        face_gt = jnp.concatenate([x[..., :jaw_d], x[..., -100:]], axis=-1)
        return face_step(state, {"aud_feat": batch["aud_feat"],
                                 "face_gt": face_gt,
                                 "speaker": batch["speaker"]}, rng)

    return step


def _load_legacy_vq_vars(lvq, vq_path, x0):
    """Frozen legacy-VQ variables for the pixel prior (reference
    smplx_body_pixel.py: loads the stage-1 VQ from Model.vq_path)."""
    import jax
    from probtalk_tpu.train.state import adamw, create_train_state
    from probtalk_tpu.train.trainer import Checkpointer

    tmpl = create_train_state(lvq, (x0[:1],), jax.random.key(8), adamw(1e-4),
                              init_kwargs={"train": True})
    if vq_path and os.path.exists(vq_path):
        restored, _ = Checkpointer(vq_path).restore(tmpl)
        if restored is not None:
            tmpl = restored
    return {"params": tmpl.params, **tmpl.mutables}


def _gan_composite(g_state, d_state, g_step, d_step, gan: bool):
    """One Trainer-shaped step alternating G and D updates (the reference's
    in-step D update when Model.gan, speech2gesture TrainWrapper). With
    gan=False the D step is skipped entirely (pure recon training)."""
    import jax

    state = {"g": g_state, "d": d_state}

    def step(s, batch, rng):
        kg, kd = jax.random.split(rng)
        new_g, gm = g_step(s["g"], s["d"], batch2gan(batch), kg)
        out = dict(s, g=new_g)
        metrics = dict(gm, loss=gm["g_loss"])
        if gan:
            new_d, dm = d_step(s["d"], new_g, batch2gan(batch), kd)
            out["d"] = new_d
            metrics.update(dm)
        return out, metrics

    def batch2gan(batch):
        return {"aud_feat": batch["aud_feat"], "motion": batch["poses_fbhe"]}

    return state, step, None


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
