"""Train-step tests for face / embedder / legacy-VQ / pixelcnn / GAN stages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.models.face import FaceGenerator
from probtalk_tpu.models.embedding_net import EmbeddingNet
from probtalk_tpu.models.legacy import (
    LegacyVQVAE, GatedPixelCNN2D, Speech2GestureG, Speech2GestureD,
)
from probtalk_tpu.train.state import create_train_state, adamw
from probtalk_tpu.train import stages_extra as se

B, T = 2, 16


def run_steps(step, state, batch, n=12):
    key = jax.random.key(0)
    hist = []
    for _ in range(n):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)
        hist.append(float(m["loss"] if "loss" in m else list(m.values())[0]))
    assert np.all(np.isfinite(hist)), hist
    return state, hist


class TestFaceStep:
    def test_learns(self, rng):
        m = FaceGenerator(hidden=32)
        aud = jnp.asarray(rng.normal(size=(B, T, 768)).astype(np.float32))
        gt = jnp.asarray(rng.normal(size=(B, T, 106)).astype(np.float32) * 0.1)
        spk = jnp.zeros((B,), jnp.int32)
        state = create_train_state(m, (aud, spk), jax.random.key(0), adamw(3e-3))
        step = se.make_face_train_step(m, donate=False)
        _, hist = run_steps(step, state, {"aud_feat": aud, "face_gt": gt,
                                          "speaker": spk})
        assert hist[-1] < hist[0]


class TestEmbedderStep:
    def test_learns(self, rng):
        m = EmbeddingNet(pose_dim=12, n_frames=90)
        w = jnp.asarray(rng.normal(size=(B, 90, 12)).astype(np.float32) * 0.1)
        state = create_train_state(m, (w,), jax.random.key(0), adamw(3e-3),
                                   init_kwargs={"train": True})
        step = se.make_embedder_train_step(m, donate=False)
        _, hist = run_steps(step, state, {"windows": w})
        assert hist[-1] < hist[0]


class TestLegacyVQStep:
    def test_learns(self, rng):
        m = LegacyVQVAE(in_dim=20, embedding_dim=16, num_codes=8, hiddens=32,
                        res_layers=1)
        x = jnp.asarray(rng.normal(size=(B, T, 20)).astype(np.float32) * 0.1)
        state = create_train_state(m, (x,), jax.random.key(0), adamw(3e-3),
                                   init_kwargs={"train": True})
        step = se.make_legacy_vq_train_step(m, donate=False)
        new_state, hist = run_steps(step, state, {"motion": x})
        assert hist[-1] < hist[0]
        assert int(new_state.mutables["quant"]["vq"].counter) == 12


class TestPixelCNNStep:
    def test_ce_decreases(self, rng):
        body_vq = LegacyVQVAE(in_dim=10, embedding_dim=16, num_codes=8,
                              hiddens=16, res_layers=1)
        x0 = jnp.zeros((1, T, 10), jnp.float32)
        vq_vars = body_vq.init({"params": jax.random.key(0),
                                "quant": jax.random.key(1)}, x0, train=True)
        prior = GatedPixelCNN2D(num_codes=8, dim=16, layers=2)
        codes0 = jnp.zeros((B, T // 4, 2), jnp.int32)
        spk = jnp.zeros((B,), jnp.int32)
        aud = jnp.zeros((B, T // 4, 8), jnp.float32)
        state = create_train_state(prior, (codes0, spk, aud), jax.random.key(2),
                                   adamw(3e-3))
        step = se.make_pixelcnn_train_step(prior, body_vq, vq_vars, donate=False)
        body = jnp.asarray(rng.normal(size=(B, T, 10)).astype(np.float32))
        batch = {"body": body, "hand": body, "aud_code_rate": aud, "speaker": spk}
        _, hist = run_steps(step, state, batch)
        assert hist[-1] < hist[0]


class TestGANSteps:
    def test_alternating_updates(self, rng):
        g = Speech2GestureG(out_dim=10, features=16)
        d = Speech2GestureD(features=8)
        aud = jnp.asarray(rng.normal(size=(B, T, 12)).astype(np.float32))
        mo = jnp.asarray(rng.normal(size=(B, T, 10)).astype(np.float32))
        g_state = create_train_state(g, (aud,), jax.random.key(0), adamw(1e-3),
                                     init_kwargs={"train": True})
        d_state = create_train_state(d, (mo,), jax.random.key(1), adamw(1e-3),
                                     init_kwargs={"train": True})
        g_step, d_step = se.make_gan_train_steps(g, d)
        batch = {"aud_feat": aud, "motion": mo}
        key = jax.random.key(2)
        for i in range(4):
            key, k1, k2 = jax.random.split(key, 3)
            g_state, gm = g_step(g_state, d_state, batch, k1)
            d_state, dm = d_step(d_state, g_state, batch, k2)
        assert np.isfinite(float(gm["g_loss"]))
        assert np.isfinite(float(dm["d_loss"]))
        assert int(g_state.step) == 4 and int(d_state.step) == 4
