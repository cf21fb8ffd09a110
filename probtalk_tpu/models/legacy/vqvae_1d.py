"""TalkSHOW stage-1 VQ-VAE (s2g_body_vq) and plain AE.

Capability of the reference's ``nets/spg/vqvae_1d.py:69-220``: conv encoder
with TWO stride-2 downsamples (T -> T/4), single-codebook EMA quantizer,
mirrored decoder. The composition config trains two of these (body / hand).
Also the plain ``AE`` variant used by the old FGD feature extractor.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from probtalk_tpu.models.conv import ConvNormRelu, ResCNRStack
from probtalk_tpu.quant import pq, vq_ema


class LegacyEncoder(nn.Module):
    """(B, T, C) -> (B, T/4, embedding_dim) (reference vqvae_1d.py:69-97)."""

    embedding_dim: int = 512
    hiddens: int = 1024
    res_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h4, h2 = self.hiddens // 4, self.hiddens // 2
        h = ConvNormRelu(h4, leaky=True, name="project")(x, train)
        h = ResCNRStack(h4, self.res_layers, leaky=True, name="enc_1")(h, train)
        h = ConvNormRelu(h2, sample="down", leaky=True, residual=True, name="down_1")(h, train)
        h = ResCNRStack(h2, self.res_layers, leaky=True, name="enc_2")(h, train)
        h = ConvNormRelu(self.hiddens, sample="down", leaky=True, residual=True,
                         name="down_2")(h, train)
        h = ResCNRStack(self.hiddens, self.res_layers, leaky=True, name="enc_3")(h, train)
        return nn.Conv(self.embedding_dim, (1,), name="pre_vq_conv")(h)


class LegacyDecoder(nn.Module):
    """(B, T/4, E) -> (B, T, C) (reference vqvae_1d.py:115-146)."""

    out_dim: int
    hiddens: int = 1024
    res_layers: int = 2

    @nn.compact
    def __call__(self, e, train: bool = False):
        h4, h2 = self.hiddens // 4, self.hiddens // 2
        h = nn.Conv(self.hiddens, (1,), name="aft_vq_conv")(e)
        h = ResCNRStack(self.hiddens, self.res_layers, leaky=True, name="dec_1")(h, train)
        h = ConvNormRelu(h2, sample="up", leaky=True, residual=True, name="up_2")(h, train)
        h = ResCNRStack(h2, self.res_layers, leaky=True, name="dec_2")(h, train)
        h = ConvNormRelu(h4, sample="up", leaky=True, residual=True, name="up_3")(h, train)
        h = ResCNRStack(h4, self.res_layers, leaky=True, name="dec_3")(h, train)
        return nn.Conv(self.out_dim, (1,), name="project")(h)


class LegacyVQVAE(nn.Module):
    """Single-codebook VQ-VAE at T/4 (reference VQVAE, vqvae_1d.py:147-187)."""

    in_dim: int = 270          # 'bh' channels by default
    embedding_dim: int = 512
    num_codes: int = 2048
    hiddens: int = 1024
    res_layers: int = 2
    commitment_cost: float = 0.25
    decay: float = 0.99

    def setup(self):
        self.encoder = LegacyEncoder(self.embedding_dim, self.hiddens, self.res_layers)
        self.decoder = LegacyDecoder(self.in_dim, self.hiddens, self.res_layers)
        self.quant_state = self.variable(
            "quant", "vq",
            lambda: vq_ema.vq_init(self.make_rng("params"), self.num_codes,
                                   self.embedding_dim),
        )

    def encode(self, x, train: bool = False):
        z = self.encoder(x, train)
        quant, idx = vq_ema.vq_forward_eval(self.quant_state.value, z)
        return quant, idx

    def decode_codes(self, idx, train: bool = False):
        e = vq_ema.vq_lookup_codes(self.quant_state.value, idx)
        return self.decoder(e, train)

    def __call__(self, x, train: bool = False, axis_name=None):
        z = self.encoder(x, train)
        if train:
            ste, new_state, commit, idx = vq_ema.vq_forward_train(
                self.quant_state.value, z, self.make_rng("quant"),
                commitment_cost=self.commitment_cost, decay=self.decay,
                axis_name=axis_name,
            )
            if not self.is_initializing():
                self.quant_state.value = new_state
            e = ste
        else:
            e, idx = vq_ema.vq_forward_eval(self.quant_state.value, z)
            commit = jnp.zeros((), jnp.float32)
        return self.decoder(e, train), commit, idx


class LegacyAE(nn.Module):
    """Plain conv AE (reference AE, vqvae_1d.py:190-220; also the old FGD
    feature extractor s2g_body_ae, nets/body_ae.py:23-151)."""

    in_dim: int = 270
    embedding_dim: int = 512
    hiddens: int = 1024
    res_layers: int = 2

    def setup(self):
        self.encoder = LegacyEncoder(self.embedding_dim, self.hiddens, self.res_layers)
        self.decoder = LegacyDecoder(self.in_dim, self.hiddens, self.res_layers)

    def encode(self, x, train: bool = False):
        return self.encoder(x, train)

    def __call__(self, x, train: bool = False):
        z = self.encoder(x, train)
        return self.decoder(z, train), z
