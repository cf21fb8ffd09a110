"""Older baseline model families carried for comparison parity.

Capabilities of:
  * LS3DCG      — joint face+body UNet-ish conv baseline
                  (``nets/LS3DCG.py:110-309``)
  * Speech2Gesture — GAN conv generator + patch discriminator
                  (``nets/speech2gesture.py:225-606``,
                  ``nets/spg/s2glayers.py:303-522``)
  * Audio2Gestures — VAE baseline with shared/motion-specific latents
                  (``nets/Audio2Gestures.py:26-756``)
  * BodyAE      — plain conv AE FGD feature extractor
                  (``nets/body_ae.py:23-151``)

Rebuilt as compact channel-last flax modules with the same conditioning
surfaces (audio features in, motion channels out, speaker id embeddings).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from probtalk_tpu.models.conv import ConvNormRelu, ResCNRStack
from probtalk_tpu.models.legacy.vqvae_1d import LegacyEncoder, LegacyDecoder


class UNet1D(nn.Module):
    """Conv UNet over time: the backbone shared by LS3DCG and
    Speech2Gesture's generator (reference nets/layers.py UNet1D and
    s2glayers.py:303-420)."""

    features: int = 256
    depth: int = 4
    out_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        h = ConvNormRelu(self.features, leaky=True, name="in")(x, train)
        for i in range(self.depth):
            skips.append(h)
            h = ConvNormRelu(self.features, sample="down", leaky=True,
                             residual=True, name=f"down_{i}")(h, train)
        for i in range(self.depth):
            h = ConvNormRelu(self.features, sample="up", leaky=True,
                             residual=True, name=f"up_{i}")(h, train)
            skip = skips[-(i + 1)]
            h = h[:, : skip.shape[1]] + skip
        return nn.Conv(self.out_dim, (1,), name="out")(h)


class LS3DCG(nn.Module):
    """Joint face+body baseline: audio -> all 376 fbhe channels at once."""

    out_dim: int = 376
    features: int = 256
    n_classes: int = 4

    @nn.compact
    def __call__(self, aud_feat, speaker=None, train: bool = False):
        h = nn.Conv(self.features, (1,), name="aud_proj")(aud_feat)
        if speaker is not None:
            emb = nn.Embed(self.n_classes, self.features, name="id_embed")(speaker)
            h = h + emb[:, None, :]
        body = UNet1D(self.features, 3, self.out_dim - 106, name="body_net")(h, train)
        face = UNet1D(self.features, 2, 106, name="face_net")(h, train)
        return jnp.concatenate([face[..., :6], body, face[..., 6:]], axis=-1)


class Speech2GestureG(nn.Module):
    """GAN generator: audio -> motion (reference s2glayers Generator)."""

    out_dim: int = 270
    features: int = 256

    @nn.compact
    def __call__(self, aud_feat, train: bool = False):
        h = nn.Conv(self.features, (1,), name="aud_proj")(aud_feat)
        h = UNet1D(self.features, 4, self.features, name="unet")(h, train)
        for i in range(4):
            h = ConvNormRelu(self.features, leaky=True, name=f"dec_{i}")(h, train)
        return nn.Conv(self.out_dim, (1,), name="out")(h)


class Speech2GestureD(nn.Module):
    """Patch discriminator over motion-difference sequences
    (reference s2glayers.py Discriminator: operates on pose diffs)."""

    features: int = 64

    @nn.compact
    def __call__(self, motion, train: bool = False):
        d = jnp.diff(motion, axis=1)
        h = nn.Conv(self.features, (4,), strides=(2,), padding=[(1, 1)], name="c0")(d)
        h = nn.leaky_relu(h, 0.2)
        h = ConvNormRelu(self.features * 2, sample="down", leaky=True, name="c1")(h, train)
        h = ConvNormRelu(self.features * 4, leaky=True, name="c2")(h, train)
        return nn.Conv(1, (1,), name="out")(h)[..., 0]


class Audio2Gestures(nn.Module):
    """VAE baseline with shared + motion-specific latent split
    (reference Audio2Gestures.py:26-756): audio and motion encoders each
    produce (shared, specific) gaussians; decoding combines audio-shared +
    sampled specific."""

    out_dim: int = 270
    latent: int = 128
    features: int = 256

    def setup(self):
        self.audio_enc = LegacyEncoder(self.features, self.features * 2, 1)
        self.motion_enc = LegacyEncoder(self.features, self.features * 2, 1)
        self.a_shared = nn.Dense(self.latent * 2)
        self.a_spec = nn.Dense(self.latent * 2)
        self.m_shared = nn.Dense(self.latent * 2)
        self.m_spec = nn.Dense(self.latent * 2)
        self.decoder = LegacyDecoder(self.out_dim, self.features * 2, 1)
        self.lat_proj = nn.Dense(self.features)

    def _split(self, head, h):
        mu, logvar = jnp.split(head(h), 2, axis=-1)
        return mu, jnp.clip(logvar, -10, 10)

    def __call__(self, aud_feat, motion=None, train: bool = False, rng=None):
        """Training: both encoders; inference: audio only.
        Returns (recon, dict of latents)."""
        ha = self.audio_enc(aud_feat, train)
        a_sh = self._split(self.a_shared, ha)
        a_sp = self._split(self.a_spec, ha)
        lat = {"a_shared": a_sh, "a_spec": a_sp}
        if motion is not None:
            hm = self.motion_enc(motion, train)
            m_sh = self._split(self.m_shared, hm)
            m_sp = self._split(self.m_spec, hm)
            lat.update(m_shared=m_sh, m_spec=m_sp)
            shared_mu, spec_mu = m_sh[0], m_sp[0]
        else:
            shared_mu, spec_mu = a_sh[0], a_sp[0]
        if train and rng is not None:
            spec = spec_mu + jnp.exp(0.5 * lat.get("m_spec", a_sp)[1]) * \
                jax.random.normal(rng, spec_mu.shape)
        else:
            spec = spec_mu
        z = jnp.concatenate([shared_mu, spec], axis=-1)
        recon = self.decoder(self.lat_proj(z), train)
        return recon, lat


class BodyAE(nn.Module):
    """Plain conv AE used as the old FGD feature extractor
    (reference nets/body_ae.py:23-151)."""

    in_dim: int = 270
    embedding_dim: int = 512

    def setup(self):
        self.encoder = LegacyEncoder(self.embedding_dim, 1024, 2)
        self.decoder = LegacyDecoder(self.in_dim, 1024, 2)

    def extract(self, x):
        return self.encoder(x, False)

    def __call__(self, x, train: bool = False):
        z = self.encoder(x, train)
        return self.decoder(z, train), z
