"""Generic sequence-model layer library.

Capability of the reference's ``nets/layers.py:25-1051`` (the
Speech2Gesture-era toolbox: ConvNormRelu variants, UNet1D, SeqEncoder /
SeqDecoder / SeqTranslator in 1D conv and RNN flavors, Audio2Pose heads),
rebuilt channel-last in flax. The ProbTalk path does not use these; they
back the older baselines and remain available for experiments.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from probtalk_tpu.models.conv import ConvNormRelu

# UNet1D lives with the baselines that use it; re-exported here to mirror
# the reference's single layers.py surface.
from probtalk_tpu.models.legacy.baselines import UNet1D  # noqa: F401


class SeqEncoder1D(nn.Module):
    """Conv sequence encoder: stacked strided ConvNormRelu, T -> T/2^depth
    (reference SeqEncoder1D)."""

    features: int = 256
    depth: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvNormRelu(self.features, leaky=True, name="in")(x, train)
        for i in range(self.depth):
            h = ConvNormRelu(self.features, sample="down", leaky=True,
                             residual=True, name=f"down_{i}")(h, train)
        return h


class SeqDecoder1D(nn.Module):
    """Conv sequence decoder: stacked transposed convs, T -> T*2^depth
    (reference SeqDecoder1D)."""

    out_dim: int
    features: int = 256
    depth: int = 3

    @nn.compact
    def __call__(self, h, train: bool = False):
        for i in range(self.depth):
            h = ConvNormRelu(self.features, sample="up", leaky=True,
                             residual=True, name=f"up_{i}")(h, train)
        return nn.Conv(self.out_dim, (1,), name="out")(h)


class SeqTranslator1D(nn.Module):
    """Length-preserving conv translator (reference SeqTranslator1D):
    stacked residual ConvNormRelu blocks, audio features -> pose features."""

    out_dim: int
    features: int = 256
    layers: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (1,), name="in")(x)
        for i in range(self.layers):
            h = ConvNormRelu(self.features, leaky=True, residual=True,
                             name=f"block_{i}")(h, train)
        return nn.Conv(self.out_dim, (1,), name="out")(h)


class SeqEncoderRNN(nn.Module):
    """GRU sequence encoder (reference SeqEncoderRNN) — lax.scan-backed."""

    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        cell = nn.GRUCell(self.hidden, name="gru")
        b = x.shape[0]
        carry = cell.initialize_carry(jax.random.key(0), (b, x.shape[-1]))
        scan = nn.RNN(cell, name="rnn")
        return scan(x)


class SeqDecoderRNN(nn.Module):
    """GRU decoder head (reference SeqDecoderRNN)."""

    out_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, h):
        y = nn.RNN(nn.GRUCell(self.hidden, name="gru"), name="rnn")(h)
        return nn.Dense(self.out_dim, name="out")(y)


class Audio2Pose(nn.Module):
    """Audio -> pose head combining a conv encoder and translator
    (reference Audio2Pose at nets/layers.py tail)."""

    pose_dim: int = 108
    features: int = 256

    @nn.compact
    def __call__(self, aud, train: bool = False):
        h = SeqEncoder1D(self.features, depth=2, name="enc")(aud, train)
        h = SeqDecoder1D(self.features, self.features, depth=2,
                         name="dec")(h, train)
        return nn.Conv(self.pose_dim, (1,), name="head")(h)
