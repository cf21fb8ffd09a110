"""1-D conv building blocks in flax, channels-last (B, T, C).

Capabilities of the reference's ``nets/spg/vqvae_modules.py:13-246``
(ConvNormRelu / Res_CNR_Stack / GatedActivation and the causal variants),
redesigned for XLA: channels-last layout (feature axis = TPU lane axis),
explicit symmetric padding so strided convs exactly halve/double T, and
norms computed in float32.

Exact stride geometry (matching the torch shapes):
  down: kernel 4, stride 2, pad (1, 1)        -> T/2
  up:   transposed kernel 4, stride 2, 'SAME' -> 2T
  none: kernel 3, stride 1, 'SAME'            -> T
  one:  kernel 1                              -> T
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


class GatedActivation(nn.Module):
    """x -> tanh(a) * sigmoid(b) with [a, b] = conv1x1(x)
    (reference vqvae_modules.py:13-21)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features * 2, (1,), name="conv")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return jnp.tanh(a) * nn.sigmoid(b)


def _norm_layer(kind: str, train: bool, name: str):
    if kind == "bn":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name=name, dtype=jnp.float32)
    if kind == "gn":
        return nn.GroupNorm(num_groups=32, name=name, dtype=jnp.float32)
    raise ValueError(kind)


class ConvNormRelu(nn.Module):
    """conv -> dropout -> norm -> (+residual) -> (leaky)relu.

    sample: 'none' | 'one' | 'down' | 'up'; norm: 'bn' | 'gn' | 'gate'.
    (reference vqvae_modules.py:107-200)
    """

    features: int
    sample: str = "none"
    norm: str = "bn"
    leaky: bool = False
    slope: float = 0.2
    residual: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.sample == "none":
            h = nn.Conv(self.features, (3,), padding="SAME", name="conv")(x)
        elif self.sample == "one":
            h = nn.Conv(self.features, (1,), name="conv")(x)
        elif self.sample == "down":
            h = nn.Conv(self.features, (4,), strides=(2,), padding=[(1, 1)], name="conv")(x)
        elif self.sample == "up":
            h = nn.ConvTranspose(self.features, (4,), strides=(2,), padding="SAME", name="conv")(x)
        else:
            raise ValueError(self.sample)

        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)

        if self.norm == "gate":
            h = GatedActivation(self.features, name="gate")(h)
        else:
            h = _norm_layer(self.norm, train, "norm")(h)

        if self.residual:
            if self.sample == "down":
                res = nn.Conv(self.features, (4,), strides=(2,), padding=[(1, 1)],
                              name="residual")(x)
            elif self.sample == "up":
                res = nn.ConvTranspose(self.features, (4,), strides=(2,), padding="SAME",
                                       name="residual")(x)
            elif x.shape[-1] == self.features:
                res = x
            else:
                res = nn.Conv(self.features, (3,), padding="SAME", name="residual")(x)
            h = h + res

        if self.leaky:
            return nn.leaky_relu(h, negative_slope=self.slope)
        return nn.relu(h)


class ResCNRStack(nn.Module):
    """N ConvNormRelu layers + conv/norm tail with a global skip:
    relu(norm(conv(h)) + x) (reference Res_CNR_Stack, vqvae_modules.py:203-245)."""

    features: int
    layers: int = 2
    leaky: bool = False
    leaky_out: bool = False
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for i in range(self.layers):
            h = ConvNormRelu(self.features, leaky=self.leaky, norm=self.norm,
                             name=f"layer_{i}")(h, train)
        h = nn.Conv(self.features, (3,), padding="SAME", name="conv")(h)
        h = _norm_layer("bn", train, "norm")(h)
        h = h + x
        if self.leaky_out:
            return nn.leaky_relu(h, negative_slope=0.2)
        return nn.relu(h)


class ConditionEncoder(nn.Module):
    """1x1 feature map + 3 residual stride-2 downs: T -> T/8, used for
    audio/text conditioning of the predictor
    (reference nets/inpainting/vqvae_1d_sc.py:70-91)."""

    features: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (1,), name="feature_map")(x)
        h = _norm_layer("bn", train, "fm_norm")(h)
        h = nn.leaky_relu(h, negative_slope=0.1)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        for i in range(3):
            h = ConvNormRelu(self.features, sample="down", leaky=True, residual=True,
                             dropout=self.dropout, name=f"down_{i}")(h, train)
        return h


class AudioEncoderWav2(nn.Module):
    """Wav2vec-feature condition encoder: 1x1 map + 3 residual downs
    (reference AudioEncoder_Wav2, vqvae_1d_sc.py:48-67)."""

    features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (1,), name="audio_feature_map")(x)
        h = _norm_layer("bn", train, "fm_norm")(h)
        h = nn.leaky_relu(h, negative_slope=0.1)
        for i in range(3):
            h = ConvNormRelu(self.features, sample="down", leaky=True,
                             residual=True, name=f"down_{i}")(h, train)
        return h


class MotionEncoder(nn.Module):
    """Gated-norm motion condition encoder (reference MotionEncoder,
    vqvae_1d_sc.py:94-115)."""

    features: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (1,), name="feature_map")(x)
        h = GatedActivation(self.features, name="gate")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        for i in range(3):
            h = ConvNormRelu(self.features, sample="down", leaky=True, slope=1.0,
                             residual=True, norm="gate", dropout=self.dropout,
                             name=f"down_{i}")(h, train)
        return h


class TextEncoder(nn.Module):
    """Text condition encoder: project + 3 residual downs
    (reference TextEncoder, vqvae_1d_sc.py:15-45)."""

    features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvNormRelu(self.features, leaky=True, name="project")(x, train)
        for i in range(3):
            h = ConvNormRelu(self.features, sample="down", leaky=True,
                             residual=True, name=f"down_{i}")(h, train)
        return h


class EncoderTopDown(nn.Module):
    """No-downsample stacked encoder (reference EncoderTopDown,
    vqvae_1d_sc.py:118-149)."""

    features: int = 256
    res_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvNormRelu(self.features, leaky=True, name="project")(x, train)
        for i in range(3):
            h = ResCNRStack(self.features, self.res_layers, leaky=True,
                            leaky_out=True, name=f"enc_{i}")(h, train)
        return h
