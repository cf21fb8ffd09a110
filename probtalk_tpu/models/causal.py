"""Causal (streaming) conv encoder/decoder variant.

Capability of the reference's ``Casual_Encoder`` / ``Casual_Decoder`` and
``CasualConv`` / ``CasualCT`` (``nets/spg/vqvae_modules.py:32-104,
381-434``): kernel-2 causal convs whose non-strided layers prepend either a
zero frame or the previous chunk's trailing frame (``pre_state``), enabling
chunk-by-chunk streaming inference with no lookahead.

Functional streaming state: every call returns the per-layer trailing
frames to feed the next chunk.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import flax.linen as nn


class CausalConv(nn.Module):
    """k=2 causal conv (+BN+leaky relu). Non-strided: prepend pre_state
    (or zero) so output length == input length; strided: T -> T/2."""

    features: int
    downsample: bool = False

    @nn.compact
    def __call__(self, x, pre_state=None, train: bool = False):
        if self.downsample:
            h = nn.Conv(self.features, (2,), strides=(2,), padding="VALID",
                        name="conv")(x)
            new_state = None
        else:
            if pre_state is None:
                pre_state = jnp.zeros_like(x[:, :1])
            xc = jnp.concatenate([pre_state, x], axis=1)
            new_state = x[:, -1:]
            h = nn.Conv(self.features, (2,), padding="VALID", name="conv")(xc)
        h = nn.BatchNorm(use_running_average=not train, name="norm")(h)
        return nn.leaky_relu(h, negative_slope=0.2), new_state


class CausalConvT(nn.Module):
    """k=2 s=2 transposed conv upsample: T -> 2T (reference CasualCT)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.ConvTranspose(self.features, (2,), strides=(2,), padding="VALID",
                             name="conv")(x)
        h = nn.BatchNorm(use_running_average=not train, name="norm")(h)
        return nn.leaky_relu(h, negative_slope=0.2)


class CausalResStack(nn.Module):
    """N causal k=1 layers + conv/bn tail with skip (reference Res_CNR_Stack
    with casual=True: inner kernel 1 so only the stack tail mixes time)."""

    features: int
    layers: int = 2

    @nn.compact
    def __call__(self, x, states: Optional[List] = None, train: bool = False):
        h = x
        new_states = []
        for i in range(self.layers):
            s = states[i] if states is not None else None
            h, ns = CausalConv(self.features, name=f"layer_{i}")(h, s, train)
            new_states.append(ns)
        h = nn.Conv(self.features, (1,), name="conv")(h)
        h = nn.BatchNorm(use_running_average=not train, name="norm")(h)
        return nn.relu(h + x), new_states


class CausalEncoder(nn.Module):
    """(B, T, C) -> (B, T/4, hiddens): project, [res, down] x2, res
    (reference Casual_Encoder, vqvae_modules.py:381-404)."""

    hiddens: int = 1024
    res_layers: int = 2

    @nn.compact
    def __call__(self, x, states=None, train: bool = False):
        h4, h2 = self.hiddens // 4, self.hiddens // 2
        st = states or [None, None, None]
        new_st = []
        h = nn.Conv(h4, (1,), name="project")(x)
        h, s = CausalResStack(h4, self.res_layers, name="enc_1")(h, st[0], train)
        new_st.append(s)
        h, _ = CausalConv(h2, downsample=True, name="down_1")(h, None, train)
        h, s = CausalResStack(h2, self.res_layers, name="enc_2")(h, st[1], train)
        new_st.append(s)
        h, _ = CausalConv(self.hiddens, downsample=True, name="down_2")(h, None, train)
        h, s = CausalResStack(self.hiddens, self.res_layers, name="enc_3")(h, st[2], train)
        new_st.append(s)
        return h, new_st


class CausalDecoder(nn.Module):
    """(B, T/4, hiddens) -> (B, T, out_dim) with streaming state
    (reference Casual_Decoder, vqvae_modules.py:407-434)."""

    out_dim: int
    hiddens: int = 1024
    res_layers: int = 2

    @nn.compact
    def __call__(self, h, states=None, train: bool = False):
        h4, h2 = self.hiddens // 4, self.hiddens // 2
        st = states or [None, None, None]
        new_st = []
        h, s = CausalResStack(self.hiddens, self.res_layers, name="dec_1")(h, st[0], train)
        new_st.append(s)
        h = CausalConvT(h2, name="up_2")(h, train)
        h, s = CausalResStack(h2, self.res_layers, name="dec_2")(h, st[1], train)
        new_st.append(s)
        h = CausalConvT(h4, name="up_3")(h, train)
        h, s = CausalResStack(h4, self.res_layers, name="dec_3")(h, st[2], train)
        new_st.append(s)
        return nn.Conv(self.out_dim, (1,), name="project")(h), new_st
