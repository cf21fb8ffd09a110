"""Exact-architecture Audio2Gestures baseline.

Architecture-faithful flax twin of the reference's VAE baseline
(``nets/Audio2Gestures.py:26-524`` + the TCN blocks of
``nets/module.py:7-74``), for golden forward-parity via
``convert.torch_checkpoint.convert_audio2gestures``. The model factors
motion latents into an audio-SHARED code and a motion-SPECIFIC code;
training decodes four combinations (recon, audio2motion, audio2x with
sampled/mapped specific codes) and constrains them with the cycle /
code-consistency / diversity loss set (``Audio2Gestures.py:606-666``,
reimplemented in :func:`a2g_losses`).

Channel-last (B, T, C) throughout (the torch source permutes to (B, C, T)
for its convs; weights convert transparently).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class TCNResidualBlock(nn.Module):
    """Dilated conv residual block (reference nets/module.py:7-46):
    [conv(d) relu dropout] x2 + (1x1 skip if channels change), final relu.
    kernel 3, padding == dilation keeps T."""

    features: int
    dilation: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        d = self.dilation
        h = nn.Conv(self.features, (3,), kernel_dilation=(d,),
                    padding=[(d, d)], name="conv1")(x)
        h = nn.Dropout(self.dropout, deterministic=det)(nn.relu(h))
        h = nn.Conv(self.features, (3,), kernel_dilation=(d,),
                    padding=[(d, d)], name="conv2")(h)
        h = nn.Dropout(self.dropout, deterministic=det)(nn.relu(h))
        res = x if x.shape[-1] == self.features else \
            nn.Conv(self.features, (1,), name="downsample")(x)
        return nn.relu(h + res)


class TCN(nn.Module):
    """Stacked residual blocks with 2^i dilations (reference ConvNet)."""

    channels: Sequence[int]
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = TCNResidualBlock(c, 2 ** i, self.dropout,
                                 name=f"block_{i}")(x, train)
        return x


def _mlp_head(h, hidden, out, name):
    h = nn.Dense(hidden, name=f"{name}_0")(h)
    h = nn.relu(h)
    return nn.Dense(out, name=f"{name}_1")(h)


class A2GAudioEnc(nn.Module):
    """Audio -> shared latent (reference Audio_Enc, :51-110)."""

    hidden: int = 32          # audio_hidden_size
    dropout: float = 0.2
    vae: bool = False

    @nn.compact
    def __call__(self, aud, train: bool = False, rng=None):
        h = TCN([128, 128, 96, 96, 64], self.dropout, name="tcn")(aud, train)
        mu = _mlp_head(h, 32, self.hidden, "share_mean")
        if not self.vae:
            return mu, (None, None)
        logvar = _mlp_head(h, 32, self.hidden, "share_var")
        eps = jax.random.normal(rng, mu.shape) if rng is not None else 0.0
        return mu + eps * jnp.exp(0.5 * logvar), (mu, logvar)


class A2GMotionEnc(nn.Module):
    """Motion -> (shared, specific) latents (reference Motion_Enc,
    :112-204)."""

    hidden: int = 32          # pose_hidden_size
    dropout: float = 0.2
    share_vae: bool = False
    spec_vae: bool = False

    @nn.compact
    def __call__(self, motion, train: bool = False, rng=None):
        h = TCN([256, 256, 128, 128, 64], self.dropout, name="tcn")(motion, train)
        hs = nn.Dense(32, name="share_linear")(h)
        hp = nn.Dense(32, name="spec_linear")(h)
        sh_mu = _mlp_head(hs, 32, self.hidden, "share_mean")
        sp_mu = _mlp_head(hp, 32, self.hidden, "spec_mean")
        stats = {}
        z_share, z_spec = sh_mu, sp_mu
        if self.share_vae:
            sh_lv = _mlp_head(hs, 32, self.hidden, "share_var")
            stats["share"] = (sh_mu, sh_lv)
            if rng is not None:
                rng, k = jax.random.split(rng)
                z_share = sh_mu + jax.random.normal(k, sh_mu.shape) * \
                    jnp.exp(0.5 * sh_lv)
        if self.spec_vae:
            sp_lv = _mlp_head(hp, 32, self.hidden, "spec_var")
            stats["spec"] = (sp_mu, sp_lv)
            if rng is not None:
                z_spec = sp_mu + jax.random.normal(rng, sp_mu.shape) * \
                    jnp.exp(0.5 * sp_lv)
        return z_share, z_spec, stats


class A2GMotionDec(nn.Module):
    """(shared, specific) -> motion (reference Motion_Dec, :205-248)."""

    out_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, z_share, z_spec, train: bool = False):
        z = jnp.concatenate([z_share, z_spec], axis=-1)
        h = TCN([64, 128, 128, 256, 256], self.dropout, name="tcn")(z, train)
        h = nn.Dense(256, name="pose_g_0")(h)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, name="pose_g_1")(h)


class A2GMappingNet(nn.Module):
    """Noise -> specific-latent mapper (reference MappingNet, :249-308)."""

    hidden: int = 32
    vae: bool = False

    @nn.compact
    def __call__(self, z, train: bool = False, rng=None):
        for i in range(3):
            z = nn.Conv(self.hidden, (3,), padding=[(1, 1)],
                        name=f"net_{i}")(z)
            if i < 2:
                z = nn.relu(z)
        mu = _mlp_head(z, self.hidden, self.hidden, "spec_mean")
        if not self.vae:
            return mu, (None, None)
        lv = _mlp_head(z, self.hidden, self.hidden, "spec_var")
        eps = jax.random.normal(rng, mu.shape) if rng is not None else 0.0
        return mu + eps * jnp.exp(0.5 * lv), (mu, lv)


class A2GGenerator(nn.Module):
    """The composed training forward (reference Generator.forward,
    :452-484): recon, audio2motion, and two sampled audio2x decodes plus
    the cycle re-encoding of a2x."""

    out_dim: int
    audio_hidden: int = 32
    pose_hidden: int = 32
    dropout: float = 0.2
    with_mapping_net: bool = True

    def setup(self):
        self.audio_enc = A2GAudioEnc(self.audio_hidden, self.dropout)
        self.motion_enc = A2GMotionEnc(self.pose_hidden, self.dropout)
        self.motion_dec = A2GMotionDec(self.out_dim, self.dropout)
        self.mapping_net = A2GMappingNet(self.pose_hidden)

    def sample_spec(self, rng, shape, train: bool = False):
        z = jax.random.normal(rng, shape)
        if self.with_mapping_net:
            z, _ = self.mapping_net(z, train)
        return z

    def __call__(self, aud, gt_motion, rng, train: bool = False):
        z_audio_share, _ = self.audio_enc(aud, train)
        z_m_share, z_m_spec, _ = self.motion_enc(gt_motion, train)
        recon = self.motion_dec(z_m_share, z_m_spec, train)
        a2m = self.motion_dec(z_audio_share, z_m_spec, train)
        k1, k2 = jax.random.split(rng)
        z_x = self.sample_spec(k1, z_m_spec.shape, train)
        z_x2 = self.sample_spec(k2, z_m_spec.shape, train)
        a2x = self.motion_dec(z_audio_share, z_x, train)
        a2x2 = self.motion_dec(z_audio_share, z_x2, train)
        _, z_a2x_spec, _ = self.motion_enc(a2x, train)
        return {
            "recon": recon, "a2m": a2m, "a2x": a2x, "a2x2": a2x2,
            "z_audio_share": z_audio_share, "z_motion_share": z_m_share,
            "z_motion_spec": z_m_spec, "z_x": z_x, "z_a2x_spec": z_a2x_spec,
        }

    def inference(self, aud, rng):
        z_audio_share, _ = self.audio_enc(aud, False)
        z_spec = self.sample_spec(rng, z_audio_share.shape, False)
        return self.motion_dec(z_audio_share, z_spec, False)


def a2g_losses(out: dict, tgt, lambda_pose: float = 1.0,
               lambda_speed: float = 1.0, lambda_xspeed: float = 1.0,
               lambda_code: float = 1.0, lambda_cyc: float = 1.0,
               lambda_ds: float = 1.0, tolerance: float = 0.1):
    """The reference loss set (Audio2Gestures.py:606-666): position/speed
    L1 for recon and a2m, tolerance-gated a2x position, a2x speed, shared
    code constrain, specific-code cycle, and the (negative) diversity
    term. KL terms attach when the encoders run in VAE mode."""
    def speed(x):
        return x[:, 1:] - x[:, :-1]

    jd = jnp.abs(out["a2x"] - tgt)
    gate = (jd > tolerance).astype(jd.dtype)
    losses = {
        "recon_position": jnp.mean(jnp.abs(out["recon"] - tgt)) * lambda_pose,
        "recon_speed": jnp.mean(jnp.abs(speed(out["recon"]) - speed(tgt)))
        * lambda_speed,
        "audio2position": jnp.mean(jnp.abs(out["a2m"] - tgt)) * lambda_pose,
        "audio2speed": jnp.mean(jnp.abs(speed(out["a2m"]) - speed(tgt)))
        * lambda_speed,
        # torch masked-select mean == sum(gated)/count(gated)
        "audio2position_x": jnp.sum(jd * gate) /
        jnp.maximum(jnp.sum(gate), 1.0) * lambda_pose,
        "audio2speed_x": jnp.mean(jnp.abs(speed(out["a2x"]) - speed(tgt)))
        * lambda_xspeed,
        "share_code_constrain": jnp.mean(
            jnp.abs(out["z_audio_share"] - out["z_motion_share"]))
        * lambda_code,
        "cyc": jnp.mean(jnp.abs(out["z_a2x_spec"] - out["z_x"])) * lambda_cyc,
        "diverse": -jnp.mean(
            jnp.abs(out["a2x"] - jax.lax.stop_gradient(out["a2x2"])))
        * lambda_ds,
    }
    total = sum(losses.values())
    return total, losses
