"""Fused blockwise (flash) attention Pallas kernel for long clips.

The reference's transformers hold a full (L, L) attention matrix per head;
its PE table caps sequences at 1800 frames (``nets/inpainting/
PTransformer.py:424``) and whole-clip refinement is tiled into 180-frame
windows (``refiner.py:611-614``). Sequence-sharded refinement
(``parallel/sequence.py``) removed the window seams; this kernel removes
the O(L^2) HBM materialization: softmax(QK^T)V is computed block-by-block
in VMEM with the online-softmax recurrence, so attention memory is
O(L * block) and the score matmuls stay on the MXU.

Layout: grid (B*H, L/BQ); each program streams the K/V blocks of its head
from VMEM, carrying (m, l, acc) in f32. Head dim is zero-padded to the
128-lane width (zeros change nothing: they add 0 to every dot product).

Eval-path kernel (the refiner serving workload); training-length windows
(<=180) stay on XLA attention.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_kernel(bq: int, bk: int, n_k: int, scale: float,
                  len_ref, q_ref, k_ref, v_ref, o_ref):
    """One (head, q-block) program: online softmax over K/V blocks.

    len_ref (SMEM (1,)): true key length (padded keys masked to -inf).
    q (1, BQ, D), k/v (1, Lk_pad, D), o (1, BQ, D)."""
    q = q_ref[0].astype(jnp.float32) * scale                     # (BQ, D)
    kv_len = len_ref[0]

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)   # (BK, D)
        v = v_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (BQ, BK)
        kidx = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + j * bk
        s = jnp.where(kidx < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, -1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, -1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v,
                                        preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, q.shape[-1]), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_k, body, (m0, l0, acc0))
    o_ref[0] = acc / jnp.maximum(l, 1e-30)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, block_q: int = 256, block_k: int = 512,
                    interpret: bool = False):
    """softmax(q k^T / sqrt(D)) v, blockwise — O(L*block) attention memory.

    q: (B, H, Lq, D), k/v: (B, H, Lk, D) float. Returns (B, H, Lq, D) f32.
    Non-causal (the refiner's full self/cross attention); D is padded to
    128 lanes internally.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / np.sqrt(d)
    dp = _round_up(d, 128)
    block_q = min(block_q, _round_up(lq, 8))
    block_k = min(block_k, _round_up(lk, 8))
    lqp = _round_up(lq, block_q)
    lkp = _round_up(lk, block_k)

    def prep(x, lp):
        pad = [(0, 0), (0, 0), (0, lp - x.shape[2]), (0, dp - d)]
        return jnp.pad(x.astype(jnp.float32), pad).reshape(
            b * h, lp, dp)

    qp, kp, vp = prep(q, lqp), prep(k, lkp), prep(v, lkp)
    n_k = lkp // block_k
    kv_len = jnp.full((1,), lk, jnp.int32)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_q, block_k, n_k, scale),
        grid=(b * h, lqp // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, dp), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, dp), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, dp), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bh, iq: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * lkp * dp,
            bytes_accessed=4 * b * h * (lqp * dp * 2 + 2 * lkp * dp),
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=interpret,
    )(kv_len, qp, kp, vp)
    return out.reshape(b, h, lqp, dp)[:, :, :lq, :d]


class FlashMultiHeadAttention(nn.Module):
    """Drop-in for ``nn.MultiHeadDotProductAttention`` (same param names and
    shapes: query/key/value/out DenseGeneral) with the blockwise Pallas
    core — a checkpoint trained with either module loads into the other.
    Non-causal, deterministic (the refiner's eval workload)."""

    num_heads: int
    qkv_features: int
    block_q: int = 256
    block_k: int = 512
    interpret: bool = False

    @nn.compact
    def __call__(self, inputs_q, inputs_kv, mask=None):
        if mask is not None:
            raise ValueError("flash attention path is non-causal; pass "
                             "mask=None (causal decode stays on XLA)")
        head_dim = self.qkv_features // self.num_heads
        dg = functools.partial(nn.DenseGeneral,
                               features=(self.num_heads, head_dim), axis=-1)
        q = dg(name="query")(inputs_q)          # (B, Lq, H, D)
        k = dg(name="key")(inputs_kv)
        v = dg(name="value")(inputs_kv)
        o = flash_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                            v.transpose(0, 2, 1, 3), self.block_q,
                            self.block_k, self.interpret)
        o = o.transpose(0, 2, 1, 3).astype(inputs_q.dtype)
        return nn.DenseGeneral(features=inputs_q.shape[-1], axis=(-2, -1),
                               name="out")(o)


def xla_attention(q, k, v):
    """Reference formulation (what nn.MultiHeadDotProductAttention does):
    materializes the full (B, H, Lq, Lk) score tensor."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(d)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32)
