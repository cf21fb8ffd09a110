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

    # C++ native loader by default (VERDICT r2 item 5): the double-buffered
    # producer thread overlaps batch assembly with the device step — on the
    # 1-core host, python window gathering dominates a ~10 ms device step.
    packed = None
    dds = None
    uses_text = m.get("p_text") is not None
    if args.loader == "device" and not uses_text:
        # HBM-resident corpus: per-step H2D shrinks from the full batch
        # tensors to two (B,) int32 index vectors (data/device_dataset.py)
        try:
            from probtalk_tpu.data.device_dataset import DeviceWindowedDataset

            dds = DeviceWindowedDataset(clips, mean, std, window=window,
                                        stride=6)
        except Exception as e:
            import logging

            logging.warning("device dataset unavailable (%s); falling back "
                            "to the native loader", e)
    if args.loader in ("native", "device") and dds is None and not uses_text:
        try:
            from probtalk_tpu.data import native_loader as nl

            packed = os.path.join(cache_dir, "packed_fbhe.ptlk")
            if not os.path.exists(packed):
                nl.pack_dataset(packed, clips, mean, std)
            if nl.NativeLoader(packed, window=window, stride=6,
                               batch=bs).num_batches() == 0:
                raise RuntimeError(
                    f"no full batches of {bs} in packed dataset")
        except Exception as e:  # missing toolchain etc. — loud fallback
            import logging

            logging.warning("native loader unavailable (%s); falling back "
                            "to the python WindowedDataset", e)
            packed = None

    def batch_factory(epoch):
        if dds is not None:
            yield from dds.fbhe_batches(bs, seed=epoch, drop_remainder=True)
        elif packed is not None:
            from probtalk_tpu.data.native_loader import NativeLoader

            yield from NativeLoader(packed, window=window, stride=6,
                                    batch=bs, seed=epoch)
        else:
            yield from ds.fbhe_batches(bs, seed=epoch, drop_remainder=True)

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
        # composition=True: SEPARATE body / hand VQs (reference
        # smplx_body_vq.py:55-78) trained jointly as a composite state
        from probtalk_tpu.models.legacy import LegacyVQVAE
        from probtalk_tpu.train import stages_extra as se
        from probtalk_tpu.core import body_parts

        jaw_d, body_d = body_parts.each_dim(True)[:2]
        b0 = x0[..., jaw_d: jaw_d + body_d]
        h0 = x0[..., jaw_d + body_d: -100]
        vq_b = LegacyVQVAE(in_dim=int(b0.shape[-1]),
                           num_codes=m.get("code_num", 2048))
        vq_h = LegacyVQVAE(in_dim=int(h0.shape[-1]),
                           num_codes=m.get("code_num", 2048))
        state = {
            "body": create_train_state(vq_b, (b0,), jax.random.key(0), tx,
                                       init_kwargs={"train": True}),
            "hand": create_train_state(vq_h, (h0,), jax.random.key(1), tx,
                                       init_kwargs={"train": True}),
        }
        step_b = se.make_legacy_vq_train_step(vq_b, donate=False)
        step_h = se.make_legacy_vq_train_step(vq_h, donate=False)

        def step(s, b, k, _j=jaw_d, _bd=body_d):
            kb, kh = jax.random.split(k)
            nb, mb = step_b(s["body"],
                            {"motion": b["poses_fbhe"][..., _j:_j + _bd]}, kb)
            nh, mh = step_h(s["hand"],
                            {"motion": b["poses_fbhe"][..., _j + _bd:-100]},
                            kh)
            metrics = {"loss": mb["loss"] + mh["loss"],
                       "body_loss": mb["loss"], "hand_loss": mh["loss"]}
            return {"body": nb, "hand": nh}, metrics

        extra = None
    elif name == "s2g_body_pixel":
        from probtalk_tpu.models.legacy import LegacyVQVAE, GatedPixelCNN2D
        from probtalk_tpu.train import stages_extra as se
        from probtalk_tpu.core import body_parts

        # body/hand part split (reference smplx_body_pixel.py:55-57: the
        # frozen stage-1 pair from s2g_body_vq composition training)
        jaw_d, body_d = body_parts.each_dim(True)[:2]
        b0 = x0[..., jaw_d: jaw_d + body_d]
        h0 = x0[..., jaw_d + body_d: -100]
        vq_b = LegacyVQVAE(in_dim=int(b0.shape[-1]),
                           num_codes=m.get("code_num", 2048))
        vq_h = LegacyVQVAE(in_dim=int(h0.shape[-1]),
                           num_codes=m.get("code_num", 2048))
        bvars, hvars = _load_legacy_vq_pair(vq_b, vq_h, m.get("vq_path"),
                                            b0, h0)
        stage = GatedPixelCNN2D(num_codes=m.get("code_num", 2048))
        spk0 = jnp.asarray(sample["speaker"])
        aud0 = jnp.asarray(sample["aud_feat"])
        aud_cr0 = aud0[:, :: 4]
        codes0 = jnp.zeros((x0.shape[0], x0.shape[1] // 4, 2), jnp.int32)
        state = create_train_state(stage, (codes0, spk0, aud_cr0),
                                   jax.random.key(0), tx)
        px_step = se.make_pixelcnn_train_step(stage, (vq_b, vq_h),
                                              (bvars, hvars))

        def step(s, b, k, _j=jaw_d, _bd=body_d):
            x = b["poses_fbhe"]
            return px_step(s, {"body": x[..., _j:_j + _bd],
                               "hand": x[..., _j + _bd:-100],
                               "aud_code_rate": b["aud_feat"][:, ::4],
                               "speaker": b["speaker"]}, k)

        extra = None
    elif name in ("Audio2Gestures", "s2g_body"):
        from probtalk_tpu.models.legacy import A2GGenerator, a2g_losses
        from probtalk_tpu.train.state import TrainState
        import functools

        a2g = A2GGenerator(
            out_dim=x0.shape[-1],
            audio_hidden=m.get("audio_hidden_size", 32),
            pose_hidden=m.get("pose_hidden_size", 32),
            dropout=m.get("dropout", 0.2),
            with_mapping_net=m.get("with_mapping_net", True),
        )
        aud0 = jnp.asarray(sample["aud_feat"])
        state = create_train_state(a2g, (aud0, x0, jax.random.key(5)),
                                   jax.random.key(0), tx,
                                   init_kwargs={"train": True})

        def a2g_loss_fn(params, mutables, batch, rng):
            variables = {"params": params, **mutables}
            out, new_mut = a2g.apply(
                variables, batch["aud_feat"], batch["poses_fbhe"], rng,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, 1)})
            total, ld = a2g_losses(out, batch["poses_fbhe"])
            ld["loss"] = total
            return total, (new_mut, ld)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(s: TrainState, batch, rng):
            (_, (new_mut, ld)), grads = jax.value_and_grad(
                a2g_loss_fn, has_aux=True)(s.params, s.mutables, batch, rng)
            return s.apply_gradients(grads, new_mutables=new_mut), ld

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


def _load_legacy_vq_pair(vq_b, vq_h, vq_path, b0, h0):
    """Frozen stage-1 body/hand VQ pair for the pixel prior (reference
    smplx_body_pixel.py:55-57 loads both from Model.vq_path) — the
    composite {'body','hand'} checkpoint the s2g_body_vq branch writes.
    Fresh-init fallback keeps shape-complete dry runs working."""
    import jax
    from probtalk_tpu.train.state import adamw, create_train_state
    from probtalk_tpu.train.trainer import Checkpointer

    tmpl = {
        "body": create_train_state(vq_b, (b0[:1],), jax.random.key(8),
                                   adamw(1e-4), init_kwargs={"train": True}),
        "hand": create_train_state(vq_h, (h0[:1],), jax.random.key(9),
                                   adamw(1e-4), init_kwargs={"train": True}),
    }
    if vq_path and os.path.exists(vq_path):
        restored, _ = Checkpointer(vq_path).restore(tmpl)
        if restored is not None:
            tmpl = restored
    return ({"params": tmpl["body"].params, **tmpl["body"].mutables},
            {"params": tmpl["hand"].params, **tmpl["hand"].mutables})


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
