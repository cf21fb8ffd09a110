"""Legacy model family tests: shapes, causality, registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.models.legacy import (
    LegacyVQVAE, LegacyAE, GatedPixelCNN2D, LS3DCG, Speech2GestureG,
    Speech2GestureD, Audio2Gestures, BodyAE,
)
from probtalk_tpu.models.embedding_net import EmbeddingNet
from probtalk_tpu.models.face import FaceGenerator, face_loss

B, T = 2, 16


class TestLegacyVQVAE:
    def test_t4_downsample_and_recon(self, rng):
        m = LegacyVQVAE(in_dim=30, embedding_dim=32, num_codes=16, hiddens=32,
                        res_layers=1)
        x = jnp.asarray(rng.normal(size=(B, T, 30)).astype(np.float32))
        v = m.init({"params": jax.random.key(0), "quant": jax.random.key(1)},
                   x, train=True)
        pred, commit, idx = m.apply(v, x, train=False)
        assert pred.shape == (B, T, 30)
        assert idx.shape == (B, T // 4)  # single codebook at T/4
        dec = m.apply(v, idx, train=False, method=m.decode_codes)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(pred), atol=1e-5)

    def test_train_updates_quant(self, rng):
        m = LegacyVQVAE(in_dim=30, embedding_dim=32, num_codes=16, hiddens=32,
                        res_layers=1)
        x = jnp.asarray(rng.normal(size=(B, T, 30)).astype(np.float32))
        v = m.init({"params": jax.random.key(0), "quant": jax.random.key(1)},
                   x, train=True)
        (pred, commit, idx), mut = m.apply(
            v, x, train=True, mutable=["quant", "batch_stats"],
            rngs={"quant": jax.random.key(2)})
        assert int(mut["quant"]["vq"].counter) == 1
        assert float(commit) > 0


class TestPixelCNN:
    @pytest.fixture(scope="class")
    def model_vars(self):
        m = GatedPixelCNN2D(num_codes=16, dim=16, layers=3)
        codes = jnp.zeros((B, 4, 2), jnp.int32)
        label = jnp.zeros((B,), jnp.int32)
        aud = jnp.zeros((B, 4, 8), jnp.float32)
        v = m.init(jax.random.key(0), codes, label, aud)
        return m, v

    def test_logits_shape(self, model_vars, rng):
        m, v = model_vars
        codes = jnp.asarray(rng.integers(0, 16, (B, 4, 2)).astype(np.int32))
        aud = jnp.asarray(rng.normal(size=(B, 4, 8)).astype(np.float32))
        logits = m.apply(v, codes, jnp.zeros((B,), jnp.int32), aud)
        assert logits.shape == (B, 4, 2, 16)

    def test_causality(self, model_vars, rng):
        """Changing a future grid cell must not affect earlier logits."""
        m, v = model_vars
        aud = jnp.zeros((B, 4, 8), jnp.float32)
        label = jnp.zeros((B,), jnp.int32)
        c1 = jnp.asarray(rng.integers(0, 16, (B, 4, 2)).astype(np.int32))
        c2 = c1.at[:, 3, 1].set((c1[:, 3, 1] + 1) % 16)  # change LAST cell
        l1 = np.asarray(m.apply(v, c1, label, aud))
        l2 = np.asarray(m.apply(v, c2, label, aud))
        # logits at positions strictly before (3,1) in raster order unchanged
        np.testing.assert_allclose(l1[:, :3], l2[:, :3], atol=1e-5)
        np.testing.assert_allclose(l1[:, 3, 0], l2[:, 3, 0], atol=1e-5)

    def test_generate(self, model_vars):
        m, v = model_vars
        aud = jnp.zeros((B, 4, 8), jnp.float32)
        codes = m.apply(v, jax.random.key(1), jnp.zeros((B,), jnp.int32),
                        (4, 2), aud, method=m.generate)
        codes = np.asarray(codes)
        assert codes.shape == (B, 4, 2)
        assert codes.min() >= 0 and codes.max() < 16


class TestBaselines:
    def test_ls3dcg(self, rng):
        m = LS3DCG(out_dim=376, features=32)
        aud = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32))
        v = m.init(jax.random.key(0), aud, jnp.zeros((B,), jnp.int32))
        out = m.apply(v, aud, jnp.zeros((B,), jnp.int32))
        assert out.shape == (B, T, 376)

    def test_speech2gesture_gan_pair(self, rng):
        g = Speech2GestureG(out_dim=30, features=32)
        aud = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32))
        vg = g.init(jax.random.key(0), aud)
        fake = g.apply(vg, aud)
        assert fake.shape == (B, T, 30)
        d = Speech2GestureD(features=16)
        vd = d.init(jax.random.key(1), fake)
        score = d.apply(vd, fake)
        assert score.ndim == 2 and score.shape[0] == B

    def test_audio2gestures_paths(self, rng):
        m = Audio2Gestures(out_dim=30, latent=16, features=32)
        aud = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32))
        mo = jnp.asarray(rng.normal(size=(B, T, 30)).astype(np.float32))
        v = m.init(jax.random.key(0), aud, mo, train=True,
                   rng=jax.random.key(1))
        (rec_t, lat), _ = m.apply(v, aud, mo, train=True, rng=jax.random.key(2),
                                  mutable=["batch_stats"])
        assert rec_t.shape == (B, T, 30)
        assert "m_shared" in lat
        rec_i, lat_i = m.apply(v, aud)  # audio-only inference
        assert rec_i.shape == (B, T, 30)
        assert "m_shared" not in lat_i

    def test_body_ae_extract(self, rng):
        m = BodyAE(in_dim=30, embedding_dim=32)
        x = jnp.asarray(rng.normal(size=(B, T, 30)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        recon, z = m.apply(v, x)
        assert recon.shape == x.shape
        feat = m.apply(v, x, method=m.extract)
        assert feat.shape[0] == B


class TestFaceAndEmbedder:
    def test_face_generator(self, rng):
        m = FaceGenerator(hidden=32)
        aud = jnp.asarray(rng.normal(size=(B, T, 768)).astype(np.float32))
        v = m.init(jax.random.key(0), aud, jnp.zeros((B,), jnp.int32))
        out = m.apply(v, aud, jnp.zeros((B,), jnp.int32))
        assert out.shape == (B, T, 106)
        loss, ld = face_loss(out, jnp.zeros_like(out))
        assert np.isfinite(float(loss))

    def test_embedding_net_geometry(self, rng):
        m = EmbeddingNet(pose_dim=20, n_frames=90)
        x = jnp.asarray(rng.normal(size=(B, 90, 20)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        z, recon, mu, logvar = m.apply(v, x)
        assert z.shape == (B, 128)
        assert recon.shape == (B, 90, 20)
        feat = m.apply(v, x, method=m.extract)
        assert feat.shape == (B, 128)


class TestRegistry:
    def test_all_reference_names_buildable(self):
        from probtalk_tpu.models import build_model, MODEL_REGISTRY

        for name in ["s2g_body_vqt", "s2g_body_predictor", "s2g_body_refiner",
                     "s2g_face", "s2g_body_vq", "s2g_body_pixel", "s2g_body_ae",
                     "s2g_LS3DCG", "s2g_body", "speech2gesture", "emb_net"]:
            assert name in MODEL_REGISTRY, name
            m = build_model(name, None)
            assert m is not None
