"""Golden parity: s2glayers Generator/Discriminator (the w_pre GRU
continuity variant, ``nets/spg/s2glayers.py:157-522``) vs the flax twin.

The torch class is dormant upstream (imported by smplx_body_vq, never
instantiated; no call site passes w_pre=True) — these tests instantiate it
directly with random weights and drive BOTH w_pre branches:

  * eval w_pre: last-pre-pose renormalization -> pre_pose_encoder -> GRU
    seeding of the first UNet frame (s2glayers.py:443-451),
  * train w_pre: in_spec[:, 15:] slice, pose_encoder VAE template, frame-14
    pre-pose encoding, 5-tuple return (s2glayers.py:429-437).

Determinism: torch's template/eps draws (torch.randn / the cuda-pinned
randn_like in __reparam) are patched to zeros; the flax side passes
rng=None which zeroes the same draws. torch branch selection rides the
constructor ``training`` flag while BN/dropout ride module .eval() — the
flax twin's ``branch_train`` mirrors that split.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_loader import load_reference, patch_tf_convs, ref_import  # noqa: E402

torch = pytest.importorskip("torch")
if not load_reference():
    pytest.skip("reference not mounted", allow_module_level=True)
patch_tf_convs()

import jax.numpy as jnp  # noqa: E402

from probtalk_tpu.convert.torch_checkpoint import (  # noqa: E402
    convert_s2glayers_d, convert_s2glayers_g,
)
from probtalk_tpu.models.legacy.s2glayers_exact import (  # noqa: E402
    DiscriminatorS2GL, GeneratorS2GL, UNetS2G,
)

TOL = dict(atol=2e-4, rtol=1e-3)
POSE_DIM, EACH_DIM, TLEN, T = 325, (6, 129, 140, 50), 32, 60


def t2n(x):
    return x.detach().cpu().numpy()


@pytest.fixture()
def zero_randn(monkeypatch):
    """All torch gaussian draws -> zeros (also dodges the cuda-pinned
    randn_like in AudioEncoder.__reparam, s2glayers.py:297)."""
    monkeypatch.setattr(torch, "randn",
                        lambda *s, **k: torch.zeros(*s))
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.zeros_like(x))


class TestUNetWPre:
    def test_gru_seeded_first_frame(self, rng):
        s2gl = ref_import("nets.spg.s2glayers")
        torch.manual_seed(0)
        tu = s2gl.UNet(128 + TLEN, 256)
        tu.eval()
        x1 = rng.normal(size=(2, T, 128 + TLEN)).astype(np.float32)
        pre = rng.normal(size=(2, 1, 256)).astype(np.float32)
        with torch.no_grad():
            g_out, g_x20 = tu(torch.from_numpy(x1.transpose(0, 2, 1)),
                              pre_pose=torch.from_numpy(
                                  pre.transpose(0, 2, 1)),
                              w_pre=True)

        from probtalk_tpu.convert.torch_checkpoint import _Tree, _unet_s2gl

        t = _Tree()
        _unet_s2gl(t, tu.state_dict(), "", "u", 256)
        variables = {"params": t.params["u"], "batch_stats": t.batch_stats["u"]}
        out, x20 = UNetS2G(256).apply(variables, jnp.asarray(x1),
                                      pre_pose=jnp.asarray(pre), w_pre=True)
        np.testing.assert_allclose(np.asarray(x20),
                                   t2n(g_x20).transpose(0, 2, 1), **TOL)
        np.testing.assert_allclose(np.asarray(out),
                                   t2n(g_out).transpose(0, 2, 1), **TOL)

    def test_without_wpre_no_gru(self, rng):
        s2gl = ref_import("nets.spg.s2glayers")
        torch.manual_seed(1)
        tu = s2gl.UNet(256, 256)
        tu.eval()
        x1 = rng.normal(size=(2, T, 256)).astype(np.float32)
        with torch.no_grad():
            g_out, _ = tu(torch.from_numpy(x1.transpose(0, 2, 1)))

        from probtalk_tpu.convert.torch_checkpoint import _Tree, _unet_s2gl

        t = _Tree()
        _unet_s2gl(t, tu.state_dict(), "", "u", 256)
        variables = {"params": t.params["u"], "batch_stats": t.batch_stats["u"]}
        out, _ = UNetS2G(256).apply(variables, jnp.asarray(x1))
        np.testing.assert_allclose(np.asarray(out),
                                   t2n(g_out).transpose(0, 2, 1), **TOL)


def _build_torch_gen(training: bool):
    s2gl = ref_import("nets.spg.s2glayers")
    torch.manual_seed(2)
    tg = s2gl.Generator(n_poses=T, pose_dim=POSE_DIM, pose=55, n_pre_poses=4,
                        each_dim=list(EACH_DIM), dim_list=None,
                        use_template=True, template_length=TLEN,
                        training=training, device="cpu", separate=True,
                        expression=True)
    tg.eval()                 # BN running stats + dropout off everywhere
    tg.training = training    # ...but keep the branch flag (constructor arg)
    return tg


def _flax_gen():
    return GeneratorS2GL(pose_dim=POSE_DIM, each_dim=EACH_DIM, n_poses=T,
                         template_length=TLEN)


class TestGeneratorWPre:
    def test_eval_wpre_continuity(self, rng, zero_randn):
        """Inference continuity path: renormalized last pre-pose ->
        pre_pose_encoder -> GRU seed; template zeroed on both sides."""
        tg = _build_torch_gen(training=False)
        spec = rng.normal(size=(1, T, 256)).astype(np.float32)
        pre = rng.normal(size=(1, 15, POSE_DIM)).astype(np.float32)
        with torch.no_grad():
            golden = t2n(tg(torch.from_numpy(spec), torch.from_numpy(pre),
                            None, time_steps=T, w_pre=True))

        variables = convert_s2glayers_g(tg.state_dict())
        out = np.asarray(_flax_gen().apply(
            variables, jnp.asarray(spec), pre_poses=jnp.asarray(pre),
            time_steps=T, w_pre=True))
        assert out.shape == golden.shape == (1, T, POSE_DIM)
        np.testing.assert_allclose(out, golden, **TOL)

    def test_train_wpre_branch(self, rng, zero_randn):
        """Training w_pre branch: in_spec[:,15:], frame-14 pre-pose, VAE
        template from frames 15:, 5-tuple return."""
        tg = _build_torch_gen(training=True)
        spec = rng.normal(size=(2, T, 256)).astype(np.float32)
        gt = rng.normal(size=(2, T, POSE_DIM)).astype(np.float32)
        with torch.no_grad():
            g_out, g_tpl, g_mu, g_var, aux = tg(
                torch.from_numpy(spec), None, torch.from_numpy(gt),
                w_pre=True)

        variables = convert_s2glayers_g(tg.state_dict())
        out, tpl, mu, var, (mu2, var2, x2_0, pre_pose) = _flax_gen().apply(
            variables, jnp.asarray(spec), gt_poses=jnp.asarray(gt),
            w_pre=True, branch_train=True)
        assert out.shape == g_out.shape == (2, T - 15, POSE_DIM)
        np.testing.assert_allclose(np.asarray(out), t2n(g_out), **TOL)
        np.testing.assert_allclose(np.asarray(mu),
                                   t2n(g_mu).transpose(0, 2, 1), **TOL)
        np.testing.assert_allclose(np.asarray(var),
                                   t2n(g_var).transpose(0, 2, 1), **TOL)
        np.testing.assert_allclose(np.asarray(pre_pose),
                                   t2n(aux[3]).transpose(0, 2, 1), **TOL)

    def test_train_plain_branch(self, rng, zero_randn):
        tg = _build_torch_gen(training=True)
        spec = rng.normal(size=(2, T, 256)).astype(np.float32)
        gt = rng.normal(size=(2, T, POSE_DIM)).astype(np.float32)
        with torch.no_grad():
            g_out = t2n(tg(torch.from_numpy(spec), None,
                           torch.from_numpy(gt), w_pre=False)[0])

        variables = convert_s2glayers_g(tg.state_dict())
        out = _flax_gen().apply(variables, jnp.asarray(spec),
                                gt_poses=jnp.asarray(gt),
                                branch_train=True)[0]
        np.testing.assert_allclose(np.asarray(out), g_out, **TOL)


class TestGeneratorEvalSemantics:
    def test_pre_poses_discards_passed_template(self, rng, zero_randn):
        """torch ALWAYS redraws the template when pre_poses is given
        (s2glayers.py:449,453) — a caller-passed template is ignored. The
        flax twin must do the same."""
        tg = _build_torch_gen(training=False)
        spec = rng.normal(size=(1, T, 256)).astype(np.float32)
        pre = rng.normal(size=(1, 15, POSE_DIM)).astype(np.float32)
        junk = rng.normal(size=(1, T, TLEN)).astype(np.float32)
        with torch.no_grad():
            golden = t2n(tg(torch.from_numpy(spec), torch.from_numpy(pre),
                            None, template=torch.from_numpy(
                                junk.transpose(0, 2, 1)),
                            time_steps=T, w_pre=True))

        variables = convert_s2glayers_g(tg.state_dict())
        out = np.asarray(_flax_gen().apply(
            variables, jnp.asarray(spec), pre_poses=jnp.asarray(pre),
            template=jnp.asarray(junk), time_steps=T, w_pre=True))
        np.testing.assert_allclose(out, golden, **TOL)
        # and it equals the no-template call bit-for-bit
        out_none = np.asarray(_flax_gen().apply(
            variables, jnp.asarray(spec), pre_poses=jnp.asarray(pre),
            time_steps=T, w_pre=True))
        np.testing.assert_array_equal(out, out_none)

    def test_separate_false_fused_decoder(self, rng, zero_randn):
        """separate=False is bit-rotted upstream (decoder_in=320 declared,
        s2glayers.py:373, vs the 256-wide a_t_f actually fed at :483):
        the torch original crashes; the flax twin carries the declared
        6x512 fused stack and runs."""
        s2gl = ref_import("nets.spg.s2glayers")
        torch.manual_seed(4)
        tg = s2gl.Generator(n_poses=T, pose_dim=POSE_DIM, pose=55,
                            n_pre_poses=4, each_dim=list(EACH_DIM),
                            dim_list=None, use_template=True,
                            template_length=TLEN, training=False,
                            device="cpu", separate=False, expression=True)
        tg.eval()
        spec = torch.zeros(1, T, 256)
        with torch.no_grad(), pytest.raises(RuntimeError):
            # template=None -> randn template drawn, reaches the fused
            # decoder, which declares 320 in-channels but receives 256.
            # (A caller-PASSED template dies even earlier upstream: the
            # `elif template is None` miss leaves pre_pose unbound.)
            tg(spec, None, None, template=None, time_steps=T)

        import jax

        gen = GeneratorS2GL(pose_dim=POSE_DIM, each_dim=EACH_DIM, n_poses=T,
                            template_length=TLEN, separate=False)
        x = jnp.asarray(rng.normal(size=(1, T, 256)).astype(np.float32))
        variables = gen.init(jax.random.key(0), x, time_steps=T)
        out = gen.apply(variables, x, time_steps=T)
        assert out.shape == (1, T, POSE_DIM)


class TestDiscriminator:
    def test_patch_logits(self, rng):
        s2gl = ref_import("nets.spg.s2glayers")
        torch.manual_seed(3)
        td = s2gl.Discriminator(POSE_DIM, 55)
        td.eval()
        x = rng.normal(size=(2, T, POSE_DIM)).astype(np.float32)
        with torch.no_grad():
            golden = t2n(td(torch.from_numpy(x)))   # torch transposes inside

        variables = convert_s2glayers_d(td.state_dict())
        out = np.asarray(DiscriminatorS2GL().apply(variables,
                                                   jnp.asarray(x)))
        np.testing.assert_allclose(out, golden.transpose(0, 2, 1), **TOL)
