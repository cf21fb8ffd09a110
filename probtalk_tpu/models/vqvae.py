"""PQ-VAE over holistic motion: conv encoder -> product quantizer -> decoder.

Capability of the reference's ``VQVAE_SC`` (``nets/inpainting/vqvae_1d_sc.py:
197-325``): 4 residual conv stages with 3 stride-2 downsamples (T -> T/8),
1024 hidden channels, a 512-d pre-VQ embedding split into 4x128-d product-
quantized chunks, and a mirrored decoder. (The reference's skip-connection
plumbing is dead code — enc feats are zeroed at vqvae_1d_sc.py:302-305 — so
it is intentionally not carried over.)

The quantizer is functional state held in the 'quant' flax variable
collection; train steps mutate it explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from probtalk_tpu.models.conv import ConvNormRelu, ResCNRStack
from probtalk_tpu.quant import pq
from probtalk_tpu.quant import rq


class EncoderSC(nn.Module):
    """(B, T, C) -> (B, T/8, embedding_dim) (reference EncoderSC)."""

    embedding_dim: int = 512
    hiddens: int = 1024
    res_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h4 = self.hiddens // 4
        h2 = self.hiddens // 2
        h = ConvNormRelu(h4, leaky=True, name="project")(x, train)
        h = ResCNRStack(h4, self.res_layers, leaky=True, name="enc_1")(h, train)
        h = ConvNormRelu(h4, sample="down", leaky=True, residual=True, name="down_1")(h, train)
        h = ResCNRStack(h4, self.res_layers, leaky=True, name="enc_2")(h, train)
        h = ConvNormRelu(h2, sample="down", leaky=True, residual=True, name="down_2")(h, train)
        h = ResCNRStack(h2, self.res_layers, leaky=True, name="enc_3")(h, train)
        h = ConvNormRelu(self.hiddens, sample="down", leaky=True, residual=True,
                         name="down_3")(h, train)
        h = ResCNRStack(self.hiddens, self.res_layers, leaky=True, name="enc_4")(h, train)
        return nn.Conv(self.embedding_dim, (1,), name="pre_vq_conv")(h)


class DecoderSC(nn.Module):
    """(B, T/8, embedding_dim) -> (B, T, out_dim) (reference DecoderSC)."""

    out_dim: int
    hiddens: int = 1024
    res_layers: int = 2

    @nn.compact
    def __call__(self, e, train: bool = False):
        h4 = self.hiddens // 4
        h2 = self.hiddens // 2
        h = nn.Conv(self.hiddens, (1,), name="aft_vq_conv")(e)
        h = ResCNRStack(self.hiddens, self.res_layers, leaky=True, name="dec_1")(h, train)
        h = ConvNormRelu(h2, sample="up", leaky=True, residual=True, name="up_2")(h, train)
        h = ResCNRStack(h2, self.res_layers, leaky=True, name="dec_2")(h, train)
        h = ConvNormRelu(h4, sample="up", leaky=True, residual=True, name="up_3")(h, train)
        h = ResCNRStack(h4, self.res_layers, leaky=True, name="dec_3")(h, train)
        h = ConvNormRelu(h4, sample="up", leaky=True, residual=True, name="up_4")(h, train)
        h = ResCNRStack(h4, self.res_layers, leaky=True, name="dec_4")(h, train)
        return nn.Conv(self.out_dim, (1,), name="project")(h)


class VQVAE(nn.Module):
    """PQ/RQ-VAE: encode -> quantize -> decode.

    q_type: 'pro' (product) or 'res' (residual) — reference VQVAE_SC
    q_type switch (vqvae_1d_sc.py:293-297).
    """

    in_dim: int = 376
    embedding_dim: int = 512
    num_codes: int = 128
    groups: int = 4
    hiddens: int = 1024
    res_layers: int = 2
    q_type: str = "pro"
    commitment_cost: float = 0.25
    decay: float = 0.99

    def setup(self):
        self.encoder = EncoderSC(self.embedding_dim, self.hiddens, self.res_layers)
        self.decoder = DecoderSC(self.in_dim, self.hiddens, self.res_layers)
        chunk = (self.embedding_dim // self.groups if self.q_type == "pro"
                 else self.embedding_dim)
        g = self.groups if self.q_type == "pro" else 1
        self.quant_state = self.variable(
            "quant", "pq",
            lambda: pq.pq_init(self.make_rng("params"), g, self.num_codes, chunk),
        )

    # ------------------------------------------------------------------
    def encode(self, x, train: bool = False):
        """x (B,T,C) -> (z (B,T/8,E), quantized, indices (B,T/8,G))."""
        z = self.encoder(x, train)
        state = self.quant_state.value
        if self.q_type == "pro":
            quant, idx = pq.pq_forward_eval(state, z)
        else:
            quant, idx = rq.rq_forward_eval(state, z, self.groups)
        return z, quant, idx

    def decode(self, e, train: bool = False):
        return self.decoder(e, train)

    def decode_codes(self, idx, train: bool = False):
        """Decode predicted code indices straight to motion."""
        state = self.quant_state.value
        if self.q_type == "pro":
            e = pq.pq_lookup_codes(state, idx)
        else:
            e = rq.rq_lookup_codes(state, idx)
        return self.decoder(e, train)

    def __call__(self, x, train: bool = False, noise_ratio: float = 0.0,
                 axis_name: Optional[str] = None):
        """Full forward. Train mode updates the quantizer state in-place
        (requires mutable=['quant', 'batch_stats']) and returns
        (pred (B,T,C), commit_loss, indices)."""
        z = self.encoder(x, train)
        state = self.quant_state.value
        if train:
            key = self.make_rng("quant")
            if self.q_type == "pro":
                ste, new_state, commit, idx = pq.pq_forward_train(
                    state, z, key, noise_ratio=noise_ratio,
                    commitment_cost=self.commitment_cost, decay=self.decay,
                    axis_name=axis_name,
                )
            else:
                ste, new_state, commit, idx = rq.rq_forward_train(
                    state, z, key, self.groups,
                    commitment_cost=self.commitment_cost, decay=self.decay,
                    axis_name=axis_name,
                )
            if not self.is_initializing():
                self.quant_state.value = new_state
            e = ste
        else:
            if self.q_type == "pro":
                e, idx = pq.pq_forward_eval(state, z)
            else:
                e, idx = rq.rq_forward_eval(state, z, self.groups)
            commit = jnp.zeros((), jnp.float32)
        pred = self.decoder(e, train)
        return pred, commit, idx
