"""FGD embedder autoencoder (emb_net).

Capability of the reference's ``nets/embedding_net.py:55-157`` (vendored
from Gesture-Generation-from-Trimodal-Context): a conv pose encoder over
90-frame windows -> 128-d latent (optionally variational) + conv decoder,
trained with L1 recon + velocity. Frozen instances embed windows for the
Fréchet Gesture Distance.

Exact geometry (90-frame window, VALID padding):
  enc: C->32 (k3) -> 32->64 (k3) -> 64->64 (k4 s2) -> conv 64->32 (k3)
       90 -> 88 -> 86 -> 42 -> 40; flatten 1280 -> MLP 512 -> 256 -> 128
  dec: 128 -> 256 -> 720 -> (T=90/..., 8) -> convT/conv stack -> (90, C)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def _cnr(features, kernel, stride, name):
    return nn.Conv(features, (kernel,), strides=(stride,), padding="VALID", name=name)


class PoseEncoderConv(nn.Module):
    latent: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False, variational: bool = False,
                 rng=None):
        """x: (B, T=90, C) -> (z, mu, logvar) with z (B, 128)."""
        h = x
        for i, (f, k, s) in enumerate([(32, 3, 1), (64, 3, 1), (64, 4, 2)]):
            h = _cnr(f, k, s, f"conv_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Conv(32, (3,), padding="VALID", name="conv_out")(h)
        h = h.reshape(h.shape[0], -1)
        for i, f in enumerate([512, 256]):
            h = nn.Dense(f, name=f"fc_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, name=f"fc_bn_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Dense(self.latent, name="fc_out")(h)
        mu = nn.Dense(self.latent, name="fc_mu")(h)
        logvar = nn.Dense(self.latent, name="fc_logvar")(h)
        if variational:
            eps = jax.random.normal(rng, mu.shape)
            z = mu + jnp.exp(0.5 * logvar) * eps
        else:
            z = mu
        return z, mu, logvar


class PoseDecoderConv(nn.Module):
    out_dim: int
    n_frames: int = 90

    @nn.compact
    def __call__(self, z, train: bool = False):
        h = nn.Dense(256, name="pre_0")(z)
        h = nn.BatchNorm(use_running_average=not train, name="pre_bn")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Dense(self.n_frames * 8, name="pre_1")(h)
        h = h.reshape(h.shape[0], self.n_frames, 8)
        h = nn.ConvTranspose(32, (3,), padding="VALID", name="deconv_0")(h)
        h = nn.BatchNorm(use_running_average=not train, name="dbn_0")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.ConvTranspose(32, (3,), padding="VALID", name="deconv_1")(h)
        h = nn.BatchNorm(use_running_average=not train, name="dbn_1")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Conv(32, (3,), padding="VALID", name="conv_0")(h)
        h = nn.Conv(self.out_dim, (3,), padding="VALID", name="conv_1")(h)
        return h


class EmbeddingNet(nn.Module):
    """Autoencoder; ``extract`` is the FGD embedding surface
    (reference embedding_net.py:148-151)."""

    pose_dim: int = 376
    n_frames: int = 90
    latent: int = 128
    variational: bool = False

    def setup(self):
        self.pose_encoder = PoseEncoderConv(self.latent)
        self.decoder = PoseDecoderConv(self.pose_dim, self.n_frames)

    def __call__(self, poses, train: bool = False, rng=None):
        z, mu, logvar = self.pose_encoder(poses, train, self.variational, rng)
        recon = self.decoder(z, train)
        return z, recon, mu, logvar

    def extract(self, poses):
        z, _, _ = self.pose_encoder(poses, False, False)
        return z
