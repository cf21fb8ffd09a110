"""GatedPixelCNN-1D predictor decoder: golden parity + causality + wiring.

VERDICT round-1 item 6: golden logits vs the reference's
``nets/inpainting/gated_pixelcnn_1d.GatedPixelCNN`` (predictornet.py:56-58
selects it over the PTransformer), an AR-causality check, and a
PredictorNet(decoder_type='pixel') train/sample smoke.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probtalk_tpu.models.pixel_decoder import GatedPixelCNN1D

sys.path.insert(0, os.path.dirname(__file__))

G, TC, K, NCLS, CC = 4, 12, 16, 4, 40


def init_model(rng):
    m = GatedPixelCNN1D(groups=G, condi_dim=CC, dim=64, layers=4, num_code=K,
                        n_classes=NCLS)
    codes = jnp.zeros((2, TC, G), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(2, TC, CC)).astype(np.float32))
    label = jnp.zeros((2,), jnp.int32)
    variables = m.init(jax.random.key(0), codes, label, cond)
    return m, variables, cond, label


class TestPixelDecoder:
    def test_causality(self, rng):
        """Logits at (t, g) must not depend on inputs at later positions
        (row-major: time outer, group inner)."""
        m, variables, cond, label = init_model(rng)
        codes = jnp.asarray(rng.integers(0, K, (2, TC, G)).astype(np.int32))
        base = np.asarray(m.apply(variables, codes, label, cond))
        t0, g0 = 5, 1
        # perturb a FUTURE position
        pert = codes.at[:, t0, g0 + 1].set((codes[:, t0, g0 + 1] + 1) % K)
        out = np.asarray(m.apply(variables, pert, label, cond))
        np.testing.assert_allclose(out[:, t0, : g0 + 2], base[:, t0, : g0 + 2],
                                   atol=1e-6)
        pert2 = codes.at[:, t0 + 1].set((codes[:, t0 + 1] + 1) % K)
        out2 = np.asarray(m.apply(variables, pert2, label, cond))
        np.testing.assert_allclose(out2[:, : t0 + 1], base[:, : t0 + 1],
                                   atol=1e-6)
        # and a PAST change must reach later logits
        pert3 = codes.at[:, 0, 0].set((codes[:, 0, 0] + 1) % K)
        out3 = np.asarray(m.apply(variables, pert3, label, cond))
        assert not np.allclose(out3[:, t0], base[:, t0])

    def test_sample_shapes_and_range(self, rng):
        m, variables, cond, label = init_model(rng)
        codes = m.apply(variables, jax.random.key(1), label, cond,
                        method=m.sample)
        assert codes.shape == (2, TC, G)
        c = np.asarray(codes)
        assert c.min() >= 0 and c.max() < K

    def test_predictornet_pixel_wiring(self, rng):
        from probtalk_tpu.models.predictor import PredictorNet

        # enc_layers must stay >= 7 so the stride-2 layers (2/4/6) produce
        # the T/8 grid the code shapes assume
        net = PredictorNet(mot_dim=20, num_code=K, groups=G, enc_layers=7,
                           decoder_type="pixel", use_audio=False)
        t = 32
        motion = jnp.asarray(rng.normal(size=(2, t, 20)).astype(np.float32))
        mask = jnp.zeros((2, t, 1), jnp.float32)
        codes = jnp.zeros((2, t // 8, G), jnp.int32)
        label = jnp.zeros((2,), jnp.int32)
        variables = net.init(jax.random.key(0), motion, codes, mask, label)
        logits = net.apply(variables, motion, codes, mask, label)
        assert logits.shape == (2, t // 8, G, K)
        out = net.apply(variables, jax.random.key(1), motion, mask, label,
                        method=net.sample)
        assert out.shape == (2, t // 8, G)


class TestGoldenVsTorch:
    def test_logits_match_reference(self, rng):
        from reference_loader import load_reference, ref_import

        torch = pytest.importorskip("torch")
        if not load_reference():
            pytest.skip("reference not mounted")
        from probtalk_tpu.convert.torch_checkpoint import convert_pixel_decoder

        gp = ref_import("nets.inpainting.gated_pixelcnn_1d")
        torch.manual_seed(0)
        layers = 4
        # the reference decoder only works at intermediate_dim=512 (its
        # fusion2/3 are hard-wired Linear(1024, 512))
        tm = gp.GatedPixelCNN(G, CC, 512, layers, K, NCLS, True, False)
        tm.eval()

        codes = rng.integers(0, K, (2, TC, G)).astype(np.int64)
        cond = rng.normal(size=(2, TC, CC)).astype(np.float32)
        label = np.zeros((2,), np.int64)
        with torch.no_grad():
            golden = tm(torch.from_numpy(codes),
                        torch.from_numpy(label),
                        torch.from_numpy(cond.transpose(0, 2, 1)),
                        0.0).numpy()

        variables = convert_pixel_decoder(tm.state_dict(), layers=layers)
        jm = GatedPixelCNN1D(groups=G, condi_dim=CC, dim=512, layers=layers,
                             num_code=K, n_classes=NCLS)
        out = np.asarray(jm.apply(variables, jnp.asarray(codes.astype(np.int32)),
                                  jnp.asarray(label.astype(np.int32)),
                                  jnp.asarray(cond)))
        assert out.shape == golden.shape
        np.testing.assert_allclose(out, golden, atol=2e-4, rtol=1e-3)


class TestStageAndBuilderPlumbing:
    def test_stage_pixel_decoder_trains_and_samples(self, rng):
        from probtalk_tpu.train.stages import (
            PredictorStage, make_predictor_train_step,
        )
        from probtalk_tpu.train.state import adamw, create_train_state
        from probtalk_tpu.models.vqvae import VQVAE

        cm, ca, t, bs = 20, 8, 16, 2
        vq = VQVAE(in_dim=cm, embedding_dim=32, num_codes=K, groups=G,
                   hiddens=16, res_layers=1)
        x = jnp.zeros((bs, t, cm), jnp.float32)
        vq_vars = vq.init({"params": jax.random.key(0),
                           "quant": jax.random.key(1)}, x, train=True)
        stage = PredictorStage(mot_dim=cm, num_code=K, groups=G, aud_dim=ca,
                               decoder_type="pixel")
        state = create_train_state(
            stage, (x, jnp.zeros((bs, t // 8, G), jnp.int32),
                    jnp.zeros((bs, t, 1)), jnp.zeros((bs,), jnp.int32),
                    jnp.zeros((bs, t, ca))),
            jax.random.key(2), adamw(1e-3), init_kwargs={"train": True})
        step = make_predictor_train_step(stage, vq, vq_vars, donate=False)
        batch = {"poses_fbhe": jnp.asarray(
                     rng.normal(size=(bs, t, cm)).astype(np.float32)),
                 "aud_feat": jnp.zeros((bs, t, ca)),
                 "speaker": jnp.zeros((bs,), jnp.int32),
                 "epoch_ratio": np.float32(1.0)}
        l0 = None
        for i in range(8):
            state, m = step(state, batch, jax.random.key(i))
            l0 = float(m["loss"]) if l0 is None else l0
        assert float(m["loss"]) < l0   # pixel decoder learns

        codes = stage.apply({"params": state.params, **state.mutables},
                            jax.random.key(9), x, jnp.zeros((bs, t, 1)),
                            jnp.zeros((bs,), jnp.int32),
                            jnp.zeros((bs, t, ca)), method=stage.sample)
        assert codes.shape == (bs, t // 8, G)

    def test_builder_transformer_flag(self):
        import probtalk_tpu.models.builders  # noqa: F401 (registers names)
        from probtalk_tpu.models.registry import build_model

        class Obj(dict):
            __getattr__ = dict.get
            def get(self, k, d=None):
                return super().get(k, d)

        cfg = Obj(Model=Obj(transformer=False))
        stage = build_model("s2g_body_predictor", cfg)
        assert stage.decoder_type == "pixel"
        cfg2 = Obj(Model=Obj(transformer=True))
        assert build_model("s2g_body_predictor", cfg2).decoder_type == "transformer"
