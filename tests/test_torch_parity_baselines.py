"""Golden parity: exact baseline architectures vs the running torch
reference (VERDICT round-1 item 5).

Each test instantiates the reference torch module with random weights
(eval mode), converts the state dict, and compares forward outputs:
  * Speech2Gesture generator + discriminator (nets/speech2gesture.py)
  * LS3DCG generator + discriminator (nets/LS3DCG.py)
  * Audio2Gestures encoder/decoder/mapping modules (nets/Audio2Gestures.py)
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from probtalk_tpu.convert.torch_checkpoint import (  # noqa: E402
    convert_audio2gestures, convert_ls3dcg_d, convert_ls3dcg_g,
    convert_speech2gesture_d, convert_speech2gesture_g,
)
from probtalk_tpu.models.legacy.a2g_exact import (  # noqa: E402
    A2GAudioEnc, A2GMappingNet, A2GMotionDec, A2GMotionEnc,
)
from probtalk_tpu.models.legacy.s2g_exact import (  # noqa: E402
    LS3DCGDiscriminator, LS3DCGGenerator, S2GDiscriminator, S2GGenerator,
)

TOL = dict(atol=2e-4, rtol=1e-3)


def t2n(x):
    return x.detach().cpu().numpy()


class TestSpeech2Gesture:
    @pytest.fixture(scope="class")
    def ref_mod(self):
        return ref_import("nets.speech2gesture")

    def test_generator(self, ref_mod, rng):
        torch.manual_seed(0)
        pose_dim, t, n_pre = 54, 64, 4
        tg = ref_mod.Generator(n_poses=t, pose_dim=pose_dim, n_pre_poses=n_pre,
                               use_template=False, training=False,
                               device="cpu")
        tg.eval()
        spec = rng.normal(size=(2, 40, 64)).astype(np.float32)   # (B,T_spec,F)
        pre = rng.normal(size=(2, n_pre, pose_dim)).astype(np.float32)
        with torch.no_grad():
            golden = t2n(tg(torch.from_numpy(spec),
                            torch.from_numpy(pre.reshape(2, -1)),
                            gt_poses=None))

        variables = convert_speech2gesture_g(tg.state_dict())
        jm = S2GGenerator(pose_dim=pose_dim, n_poses=t, n_pre_poses=n_pre)
        out = np.asarray(jm.apply(variables, jnp.asarray(spec),
                                  jnp.asarray(pre)))
        assert out.shape == golden.shape == (2, t, pose_dim)
        np.testing.assert_allclose(out, golden, **TOL)

    def test_discriminator(self, ref_mod, rng):
        torch.manual_seed(1)
        td = ref_mod.Discriminator(pose_dim=54)
        td.eval()
        diff = rng.normal(size=(2, 63, 54)).astype(np.float32)
        with torch.no_grad():
            golden = t2n(td(torch.from_numpy(diff)))       # (B, 1, T')
        variables = convert_speech2gesture_d(td.state_dict())
        out = np.asarray(S2GDiscriminator().apply(variables, jnp.asarray(diff)))
        np.testing.assert_allclose(out[..., 0], golden[:, 0], **TOL)


class TestLS3DCG:
    @pytest.fixture(scope="class")
    def ref_mod(self):
        return ref_import("nets.LS3DCG")

    def test_generator(self, ref_mod, rng):
        torch.manual_seed(2)
        each_dim = [6, 90, 180, 100]
        tg = ref_mod.Generator(each_dim=each_dim, training=False, device="cpu")
        tg.eval()
        aud = rng.normal(size=(2, 64, 48)).astype(np.float32)  # (B, C, T)
        with torch.no_grad():
            golden = t2n(tg(torch.from_numpy(aud)))            # (B, T, C_out)
        variables = convert_ls3dcg_g(tg.state_dict())
        jm = LS3DCGGenerator(each_dim=tuple(each_dim))
        out = np.asarray(jm.apply(variables,
                                  jnp.asarray(aud.transpose(0, 2, 1))))
        assert out.shape == golden.shape == (2, 48, 376)
        np.testing.assert_allclose(out, golden, **TOL)

    def test_discriminator(self, ref_mod, rng):
        torch.manual_seed(3)
        td = ref_mod.Discriminator(input_dim=90 + 180 + 64)
        td.eval()
        x = rng.normal(size=(2, 48, 334)).astype(np.float32)   # (B, T, C)
        with torch.no_grad():
            golden = t2n(td(torch.from_numpy(x)))              # (B, 1, T/8)
        variables = convert_ls3dcg_d(td.state_dict())
        out = np.asarray(LS3DCGDiscriminator().apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(out[..., 0], golden[:, 0], **TOL)


class TestAudio2Gestures:
    @pytest.fixture(scope="class")
    def modules(self):
        # bit-rot: Audio2Gestures.py:15 imports `repro_nets.module`, a
        # stale package name for nets.module — alias it
        import types

        nets_module = ref_import("nets.module")
        pkg = types.ModuleType("repro_nets")
        pkg.__path__ = []
        pkg.module = nets_module
        sys.modules.setdefault("repro_nets", pkg)
        sys.modules.setdefault("repro_nets.module", nets_module)
        a2g = ref_import("nets.Audio2Gestures")
        torch.manual_seed(4)
        kw = dict(freqbasis=None, feat_in_time_domain=None)
        audio_enc = a2g.Audio_Enc(audio_size=64, dropout=0.2,
                                  audio_hidden_size=32,
                                  with_audio_share_vae=False, lambda_kl=1.0,
                                  **kw)
        motion_enc = a2g.Motion_Enc(joint_num=54, dropout=0.2,
                                    pose_hidden_size=32,
                                    with_motion_share_vae=False,
                                    with_motion_spec_vae=False,
                                    lambda_kl=1.0, **kw)
        motion_dec = a2g.Motion_Dec(joint_num=54, hidden_size=64,
                                    dropout=0.2, **kw)
        mapping = a2g.MappingNet(pose_hidden_size=32,
                                 with_mapping_net_vae=False, lambda_kl=1.0,
                                 **kw)
        for m in (audio_enc, motion_enc, motion_dec, mapping):
            m.eval()
        sd = {}
        for name, m in (("audio_enc", audio_enc), ("motion_enc", motion_enc),
                        ("motion_dec", motion_dec), ("mapping_net", mapping)):
            sd.update({f"{name}.{k}": v for k, v in m.state_dict().items()})
        return (audio_enc, motion_enc, motion_dec, mapping,
                convert_audio2gestures(sd))

    def test_audio_enc(self, modules, rng):
        audio_enc, *_, variables = modules
        aud = rng.normal(size=(2, 32, 64)).astype(np.float32)   # (B, T, C)
        with torch.no_grad():
            # reference Audio_Enc double-permutes: real input is (B, C, T)
            golden = t2n(audio_enc(
                torch.from_numpy(aud.transpose(0, 2, 1))))
        sub = {"params": variables["params"]["audio_enc"],
               "batch_stats": variables.get("batch_stats", {}).get("audio_enc", {})}
        out, _ = A2GAudioEnc().apply(sub, jnp.asarray(aud))
        np.testing.assert_allclose(np.asarray(out), golden, **TOL)

    def test_motion_enc_dec_cycle(self, modules, rng):
        _, motion_enc, motion_dec, _, variables = modules
        mot = rng.normal(size=(2, 32, 108)).astype(np.float32)
        with torch.no_grad():
            g_share, g_spec = motion_enc(
                torch.from_numpy(mot.transpose(0, 2, 1)))
            g_dec = t2n(motion_dec(g_share, g_spec).permute(0, 2, 1))
        sub_e = {"params": variables["params"]["motion_enc"]}
        z_share, z_spec, _ = A2GMotionEnc().apply(sub_e, jnp.asarray(mot))
        np.testing.assert_allclose(np.asarray(z_share), t2n(g_share), **TOL)
        np.testing.assert_allclose(np.asarray(z_spec), t2n(g_spec), **TOL)
        sub_d = {"params": variables["params"]["motion_dec"]}
        dec = A2GMotionDec(out_dim=108).apply(sub_d, z_share, z_spec)
        np.testing.assert_allclose(np.asarray(dec), g_dec, **TOL)

    def test_mapping_net(self, modules, rng):
        *_, mapping, variables = modules
        z = rng.normal(size=(2, 32, 32)).astype(np.float32)
        with torch.no_grad():
            golden = t2n(mapping(torch.from_numpy(z)))
        sub = {"params": variables["params"]["mapping_net"]}
        out, _ = A2GMappingNet().apply(sub, jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(out), golden, **TOL)
