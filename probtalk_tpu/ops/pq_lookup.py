"""Fused product-quantization nearest-code lookup.

The hot inner kernel of the PQ-VAE (capability of the reference's
``nets/spg/vqvae_modules.py:546-555``: L2 distance matrix + argmin + embed
gather, there three separate torch ops per group). Here it is ONE fused
Pallas kernel: for each group the distance matrix is computed on the MXU
(the -2*x@e^T term), the argmin runs on the VPU, and the code gather is a
one-hot matmul back on the MXU — all without leaving VMEM.

Default dims (N tokens, G=4 groups, K=128 codes, D=128 dims) map exactly
onto the 128x128 MXU tile.

A pure-XLA fallback (identical math) is used off-TPU and for testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# reference (XLA) implementation
# ---------------------------------------------------------------------------

def _pq_nearest_codes_xla(x, codebooks):
    """x: (N, G, D), codebooks: (G, K, D) -> (indices (N, G) i32, quant (N, G, D))."""
    # distances: (G, N, K) = |x|^2 + |e|^2 - 2 x.e
    xg = jnp.moveaxis(x, 1, 0)  # (G, N, D)
    x2 = jnp.sum(xg * xg, axis=-1, keepdims=True)        # (G, N, 1)
    e2 = jnp.sum(codebooks * codebooks, axis=-1)          # (G, K)
    xe = jnp.einsum(
        "gnd,gkd->gnk", xg, codebooks, preferred_element_type=jnp.float32
    )
    dist = x2 + e2[:, None, :] - 2.0 * xe
    idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)     # (G, N)
    quant = jnp.take_along_axis(
        codebooks, idx[..., None].repeat(codebooks.shape[-1], -1), axis=1
    )  # (G, N, D)
    return jnp.moveaxis(idx, 0, 1), jnp.moveaxis(quant, 0, 1)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _pq_kernel(g: int, k: int, d: int, x_ref, e_ref, idx_ref, quant_ref):
    """Grid: (num_n_tiles,). Blocks: x (TN, G*D), e (G*K, D) [full],
    idx (TN, G), quant (TN, G*D). The G-group loop is unrolled — each group
    is one (TN,D)x(D,K) MXU matmul + VPU argmin, all resident in VMEM."""
    idx_cols = []
    for gi in range(g):
        x = x_ref[:, gi * d: (gi + 1) * d]                         # (TN, D)
        e = e_ref[gi * k: (gi + 1) * k, :]                         # (K, D)
        # ||x||^2 + ||e||^2 - 2 x e^T — the matmul rides the MXU
        xe = jnp.dot(x, e.T, preferred_element_type=jnp.float32)   # (TN, K)
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        e2 = jnp.sum(e * e, axis=-1)[None, :]
        dist = x2 + e2 - 2.0 * xe
        idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)          # (TN,)
        idx_cols.append(idx)
        # gather as one-hot matmul (ties resolve identically to argmin)
        col = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], k), 1)
        onehot = (col == idx[:, None]).astype(jnp.float32)
        quant_ref[:, gi * d: (gi + 1) * d] = jnp.dot(
            onehot, e, preferred_element_type=jnp.float32)
    idx_ref[:, :] = jnp.stack(idx_cols, axis=-1)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def _pq_nearest_codes_pallas(x, codebooks, tile_n: int = 512):
    n, g, d = x.shape
    _, k, _ = codebooks.shape
    n_pad = _round_up(max(n, 8), tile_n)
    x2d = x.reshape(n, g * d)
    if n_pad != n:
        x2d = jnp.pad(x2d, ((0, n_pad - n), (0, 0)))
    e2d = codebooks.reshape(g * k, d)
    idx, quant = pl.pallas_call(
        functools.partial(_pq_kernel, g, k, d),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, g * d), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g * k, d), lambda ni: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, g), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, g * d), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, g), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, g * d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * g * k * d * 2,
            bytes_accessed=4 * (n_pad * g * d * 2 + g * k * d),
            transcendentals=0,
        ),
    )(x2d.astype(jnp.float32), e2d.astype(jnp.float32))
    return idx[:n], quant[:n].reshape(n, g, d)


def pq_nearest_codes(x, codebooks, use_pallas: bool | None = None):
    """Nearest-code lookup over G independent codebooks.

    Args:
      x: (N, G, D) float — latent chunks.
      codebooks: (G, K, D) float.
      use_pallas: force kernel choice; default = auto (TPU only).

    Returns:
      (indices (N, G) int32, quantized (N, G, D) float32)
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _pq_nearest_codes_pallas(x, codebooks)
    return _pq_nearest_codes_xla(x, codebooks)
