"""Golden parity: run the ACTUAL torch reference modules (random weights),
convert the weights, and require near-identical outputs from our flax
models. The strongest capability-parity evidence available without trained
checkpoints."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_loader import load_reference, ref_import  # noqa: E402

HAVE_REF = load_reference()
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")


@pytest.fixture(scope="module")
def torch_mod():
    import torch

    torch.manual_seed(0)
    return torch


class TestVQVAEParity:
    @pytest.fixture(scope="class")
    def pair(self, torch_mod):
        torch = torch_mod
        VQVAE_SC = ref_import('nets.inpainting.vqvae_1d_sc').VQVAE_SC
        from probtalk_tpu.models.vqvae import VQVAE
        from probtalk_tpu.convert import convert_vqvae

        tm = VQVAE_SC(40, 64, 16, 64, 2, 32, groups=4, q_type="pro")
        tm.eval()
        variables = convert_vqvae(tm.state_dict(), groups=4)
        jm = VQVAE(in_dim=40, embedding_dim=64, num_codes=16, groups=4,
                   hiddens=64, res_layers=2)
        return torch, tm, jm, variables

    def test_full_forward_parity(self, pair, rng):
        torch, tm, jm, variables = pair
        import jax.numpy as jnp

        x = rng.normal(size=(2, 40, 24)).astype(np.float32)  # torch (B, C, T)
        with torch.no_grad():
            t_out = tm(gt_poses=torch.from_numpy(x)).numpy()
        j_out = np.asarray(jm.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                    train=False)[0])
        np.testing.assert_allclose(j_out.transpose(0, 2, 1), t_out,
                                   atol=2e-4, rtol=1e-3)

    def test_code_indices_parity(self, pair, rng):
        torch, tm, jm, variables = pair
        import jax.numpy as jnp

        x = rng.normal(size=(2, 40, 24)).astype(np.float32)
        with torch.no_grad():
            _, qo, _ = tm.encode(gt_poses=torch.from_numpy(x))
            t_idx = qo.loss.numpy()  # eval mode: indices (B, T/8, G)
        _, _, j_idx = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                               train=False, method=jm.encode)
        # argmin ties can differ at fp tolerance: require >99% agreement
        agree = np.mean(np.asarray(j_idx) == t_idx)
        assert agree > 0.99, agree

    def test_decode_codes_parity(self, pair, rng):
        torch, tm, jm, variables = pair
        import jax.numpy as jnp

        idx = rng.integers(0, 16, size=(2, 3, 4)).astype(np.int64)
        with torch.no_grad():
            e = tm.vq_layer.quantize_all(torch.from_numpy(idx))
            t_dec = tm.decode(e.transpose(1, 2), None).numpy()
        j_dec = np.asarray(jm.apply(variables, jnp.asarray(idx.astype(np.int32)),
                                    train=False, method=jm.decode_codes))
        np.testing.assert_allclose(j_dec.transpose(0, 2, 1), t_dec,
                                   atol=2e-4, rtol=1e-3)


class TestConditionEncoderParity:
    def test_forward_parity(self, torch_mod, rng):
        torch = torch_mod
        import jax.numpy as jnp
        TCE = ref_import('nets.inpainting.vqvae_1d_sc').ConditionEncoder
        from probtalk_tpu.models.conv import ConditionEncoder as JCE
        from probtalk_tpu.convert.torch_checkpoint import convert_condition_encoder

        tm = TCE(24, 32, 2, 32, dp=0.0)
        tm.eval()
        variables = convert_condition_encoder(tm.state_dict())
        jm = JCE(features=32, dropout=0.0)
        x = rng.normal(size=(2, 24, 16)).astype(np.float32)
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x)).numpy()
        j_out = np.asarray(jm.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                    train=False))
        np.testing.assert_allclose(j_out.transpose(0, 2, 1), t_out,
                                   atol=2e-4, rtol=1e-3)


class TestRotationParity:
    def test_6d_vs_reference_conversions(self, rng):
        """Our rotation math vs the reference's vendored PyTorch3D code."""
        import torch
        rc = ref_import('data_utils.rotation_conversion')
        t_aa2m, t_m26 = rc.axis_angle_to_matrix, rc.matrix_to_rotation_6d
        t_62m, t_m2aa = rc.rotation_6d_to_matrix, rc.matrix_to_axis_angle
        from probtalk_tpu.core import rotation as rot

        aa = rng.normal(size=(64, 3)).astype(np.float32)
        t_m = t_aa2m(torch.from_numpy(aa))
        np.testing.assert_allclose(np.asarray(rot.axis_angle_to_matrix(aa)),
                                   t_m.numpy(), atol=1e-5)
        t_d6 = t_m26(t_m)
        np.testing.assert_allclose(np.asarray(rot.matrix_to_rotation_6d(t_m.numpy())),
                                   t_d6.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rot.rotation_6d_to_matrix(t_d6.numpy())),
                                   t_62m(t_d6).numpy(), atol=1e-5)
        back = t_m2aa(t_m).numpy()
        np.testing.assert_allclose(np.asarray(rot.matrix_to_axis_angle(t_m.numpy())),
                                   back, atol=1e-4)


class TestLegacyVQVAEParity:
    def test_forward_and_codes(self, torch_mod, rng):
        torch = torch_mod
        import jax.numpy as jnp
        VQVAE_T4 = ref_import("nets.spg.vqvae_1d").VQVAE
        from probtalk_tpu.models.legacy import LegacyVQVAE
        from probtalk_tpu.convert.torch_checkpoint import convert_legacy_vqvae

        tm = VQVAE_T4(30, 64, 16, 64, 2, 32)
        tm.eval()
        variables = convert_legacy_vqvae(tm.state_dict())
        jm = LegacyVQVAE(in_dim=30, embedding_dim=64, num_codes=16, hiddens=64,
                         res_layers=2)

        x = rng.normal(size=(2, 30, 16)).astype(np.float32)  # torch (B, C, T)
        with torch.no_grad():
            _, t_out = tm(gt_poses=torch.from_numpy(x))
            _, t_idx = tm.encode(torch.from_numpy(x))
        j_out, _, j_idx = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                   train=False)
        np.testing.assert_allclose(np.asarray(j_out).transpose(0, 2, 1),
                                   t_out.numpy(), atol=2e-4, rtol=1e-3)
        agree = np.mean(np.asarray(j_idx).reshape(-1) == t_idx.numpy().reshape(-1))
        assert agree > 0.99, agree
