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


# ---------------------------------------------------------------------------
# 2D / RNN / Graph variants (reference nets/layers.py:211-891).
# Upstream notes: UNet2D and SeqDecoder2D raise NotImplementedError IN THE
# REFERENCE, and the Graph classes reference an undefined
# `GraphConvNormRelu` (bit-rotted dead code upstream) — the Graph blocks
# here are therefore a working ST-GCN-style reconstruction.
# ---------------------------------------------------------------------------

def _cnr2d(x, features, kernel, stride, train, name_prefix, scope):
    pad = [((k - s) // 2, (k - s) // 2) for k, s in zip(kernel, stride)]
    x = nn.Conv(features, kernel, stride, padding=pad,
                name=f"{name_prefix}/conv")(x)
    x = nn.BatchNorm(use_running_average=not train,
                     name=f"{name_prefix}/norm")(x)
    return nn.relu(x)


class SeqEncoder2D(nn.Module):
    """(B, T, V, D) joint grid -> (B, C_out): the reference's exact
    halve-each-axis/double-channels conv schedule (layers.py:357-452)."""

    c_in: int          # per-joint feature dim (reference: 2)
    t_in: int
    c_out: int
    num_joints: int

    @staticmethod
    def schedule(t_in, w_in, c_out, c_start=32):
        layers, c, h, w = [], c_start, t_in, w_in
        while c < c_out or h > 1 or w > 1:
            ks, st = [3, 3], [1, 1]
            if h > 1:
                ks[0], st[0] = (4, 2) if h > 4 else (h, h)
            if w > 1:
                ks[1], st[1] = (4, 2) if w > 4 else (w, w)
            layers.append((min(c_out, c * 2), tuple(ks), tuple(st)))
            c = min(c * 2, c_out)
            h = (h // 2 if h > 4 else 1) if h > 1 else h
            w = (w // 2 if w > 4 else 1) if w > 1 else w
        return layers

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _cnr2d(x, 32, (3, 3), (1, 1), train, "l0", self)
        for i, (f, ks, st) in enumerate(
                self.schedule(self.t_in, self.num_joints, self.c_out)):
            h = _cnr2d(h, f, ks, st, train, f"l{i + 1}", self)
        return h.reshape(h.shape[0], -1)


class SeqTranslator2D(nn.Module):
    """Spectrogram-image translator (layers.py:754-798, the 'hard coded'
    11-layer 2D stack): (B, T_in=75, C_in=64) -> (B, T_out=25, 108)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x[..., None]                       # (B, T, C, 1)
        plan = [(32, 5, (1, 1)), (32, 5, (1, 1)), (32, 5, (1, 1)),
                (64, 5, (3, 4)), (64, 5, (1, 1)), (64, 5, (1, 1)),
                (128, 5, (1, 4)), (108, 3, (1, 4)),
                (108, (3, 1), (1, 1)), (108, (3, 1), (1, 1)),
                (108, (3, 1), (1, 1))]
        for i, (f, k, s) in enumerate(plan):
            kk = (k, k) if isinstance(k, int) else k
            h = _cnr2d(h, f, kk, s, train, f"t{i}", self)
        return h[:, :, 0] if h.shape[2] == 1 else h.mean(2)


class _ARDecStep(nn.Module):
    """One autoregressive GRU decode step (scanned by SeqTranslatorRNN)."""

    c_out: int
    hidden: int

    @nn.compact
    def __call__(self, carry_frame, _):
        carry, frame = carry_frame
        carry, h = nn.GRUCell(self.hidden, name="dec")(carry, frame)
        frame = nn.Dense(self.c_out, name="fc")(h)
        return (carry, frame), frame


class SeqTranslatorRNN(nn.Module):
    """GRU encoder -> autoregressive GRU decoder seeded with frame 0
    (layers.py:844-891); (B, T, C_in) + (B, 1, C_out) -> (B, T, C_out)."""

    c_out: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x, frame_0):
        enc = nn.RNN(nn.GRUCell(self.hidden), return_carry=True, name="enc")
        carry, _ = enc(x)
        scan = nn.scan(_ARDecStep, variable_broadcast="params",
                       split_rngs={"params": False}, length=x.shape[1],
                       out_axes=0)
        (_, _), outs = scan(self.c_out, self.hidden, name="dec_step")(
            (carry, frame_0[:, 0]), None)
        return jnp.moveaxis(outs, 0, 1)


class AudioPoseEncoder1D(nn.Module):
    """T-preserving conv stack (layers.py:217-266)."""

    features: int = 256
    layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.layers):
            x = ConvNormRelu(self.features, name=f"l{i}")(x, train)
        return x


class AudioPoseEncoderRNN(nn.Module):
    """GRU over time, T-preserving (layers.py:276-306)."""

    features: int = 256

    @nn.compact
    def __call__(self, x):
        return nn.RNN(nn.GRUCell(self.features), name="rnn")(x)


class GraphConvNormRelu(nn.Module):
    """ST-GCN spatial block: per-partition 1x1 convs contracted with the
    (P, V, V) adjacency, + BN + ReLU. Working reconstruction of the
    reference's missing GraphConvNormRelu (layers.py Graph classes)."""

    c_out: int
    num_parts: int

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        """x: (B, T, V, C); adj: (P, V, V) -> (B, T, V, c_out)."""
        h = nn.Conv(self.c_out * self.num_parts, (1, 1), name="conv")(x)
        b, t, v, _ = h.shape
        h = h.reshape(b, t, v, self.num_parts, self.c_out)
        h = jnp.einsum("btvpc,pvw->btwc", h, adj)
        h = nn.BatchNorm(use_running_average=not train, name="norm")(h)
        return nn.relu(h)


class AudioPoseEncoderGraph(nn.Module):
    """(B, T, V, D) -> (B, T, V, C_out): stacked graph conv blocks
    (layers.py:307-356)."""

    channels: tuple = (64, 128)
    num_parts: int = 2

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        for i, c in enumerate(self.channels):
            x = GraphConvNormRelu(c, self.num_parts, name=f"g{i}")(
                x, adj, train)
        return x


class SeqEncoderGraph(nn.Module):
    """Graph encoder + spatial pool + temporal pool -> (B, C_out)
    (layers.py:552-641)."""

    c_out: int = 512
    channels: tuple = (64, 128)
    num_parts: int = 2

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        h = AudioPoseEncoderGraph(self.channels, self.num_parts,
                                  name="graph")(x, adj, train)
        v = h.shape[2]
        h = _cnr2d(h, h.shape[-1], (1, v), (1, 1), train, "spatial", self)
        h = h[:, :, :1]                         # (B, T, 1, C)
        c, t = h.shape[-1], h.shape[1]
        i = 0
        while c < self.c_out or t > 1:
            ks, st = (4, 2) if t > 4 else ((t, t) if t > 1 else (3, 1))
            h = _cnr2d(h, min(self.c_out, c * 2), (ks, 1), (st, 1), train,
                       f"tp{i}", self)
            c = min(c * 2, self.c_out)
            t = (t // 2 if t > 4 else 1) if t > 1 else t
            i += 1
        return h.reshape(h.shape[0], -1)


class ResBlockFC(nn.Module):
    """MLP residual block (layers.py:892-931)."""

    fc_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.fc_dim // 2, name="fc0")(x))
        h = nn.relu(nn.Dense(self.fc_dim // 2, name="fc1")(h))
        h = nn.relu(nn.Dense(self.fc_dim, name="fc2")(h))
        s = nn.relu(nn.Dense(self.fc_dim, name="short")(x))
        return h + s


# TCN blocks (reference nets/module.py:7-74) live with the exact
# Audio2Gestures rebuild; re-exported here to mirror the reference surface.
from probtalk_tpu.models.legacy.a2g_exact import TCN, TCNResidualBlock  # noqa: F401,E402
