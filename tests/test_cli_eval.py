"""Face/body eval CLI helpers + device prefetcher + checkpoint-convert CLI."""

import numpy as np
import pytest

from probtalk_tpu.cli.test_face import face_metrics
from probtalk_tpu.cli.test_body import body_metrics
from probtalk_tpu.data.loader import prefetch_to_device


class TestFaceBodyMetrics:
    def test_face_metrics_zero_for_identical(self, rng):
        gt = rng.normal(size=(20, 106)).astype(np.float32)
        pred = np.tile(gt[None], (3, 1, 1))
        m = face_metrics(pred, gt)
        assert m["face_l2"] < 1e-5 and m["face_lvd"] < 1e-6
        assert m["face_diversity_norm"] < 1e-5

    def test_body_metrics_scale(self, rng):
        gt = rng.normal(size=(20, 270)).astype(np.float32)
        pred = np.stack([gt + 0.1, gt - 0.1])
        m = body_metrics(pred, gt)
        assert 0.09 < m["maje"] < 0.11
        assert m["body_diversity_norm"] > 0


class TestPrefetch:
    def test_prefetch_yields_all(self, rng):
        import jax.numpy as jnp

        batches = [{"x": rng.normal(size=(2, 3)).astype(np.float32)}
                   for _ in range(5)]
        out = list(prefetch_to_device(iter(batches)))
        assert len(out) == 5
        for o, b in zip(out, batches):
            np.testing.assert_allclose(np.asarray(o["x"]), b["x"])

    def test_prefetch_propagates_errors(self):
        def gen():
            yield {"x": np.zeros(2, np.float32)}
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(prefetch_to_device(gen()))


class TestConvertCLI:
    def test_vqt_roundtrip_through_orbax(self, tmp_path, rng):
        """Synthesize a torch-shaped ckpt dict, convert, save+load orbax."""
        import sys, os

        sys.path.insert(0, os.path.dirname(__file__))
        from reference_loader import load_reference, ref_import

        if not load_reference():
            pytest.skip("reference not mounted")
        import torch
        from probtalk_tpu.cli.convert_checkpoint import convert

        VQVAE_SC = ref_import("nets.inpainting.vqvae_1d_sc").VQVAE_SC
        tm = VQVAE_SC(40, 64, 16, 64, 2, 32, groups=4, q_type="pro")
        ckpt_path = tmp_path / "ckpt-99.pth"
        torch.save({"generator": {"VQ": tm.state_dict()}}, str(ckpt_path))

        variables = convert(str(ckpt_path), "vqt", str(tmp_path / "out"))
        assert "params" in variables and "quant" in variables
        assert (tmp_path / "out" / "variables").exists()

        # converted variables drive the flax model
        import jax.numpy as jnp
        from probtalk_tpu.models.vqvae import VQVAE

        jm = VQVAE(in_dim=40, embedding_dim=64, num_codes=16, groups=4,
                   hiddens=64, res_layers=2)
        out, _, _ = jm.apply(variables, jnp.zeros((1, 16, 40)), train=False)
        assert out.shape == (1, 16, 40)
