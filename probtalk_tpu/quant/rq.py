"""Residual Quantization — G residual depths over ONE shared codebook.

Capability of the reference's ``ResidualQuantization``
(``nets/spg/vqvae_modules.py:592-679``): same public surface as PQ but the
G code indices are successive residual approximations; decoding sums the
G embeddings instead of concatenating per-group chunks.

Reuses ``PQState`` with a single-group codebook (shape (1, K, E)).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from probtalk_tpu.ops.pq_lookup import pq_nearest_codes
from probtalk_tpu.quant.pq import PQState


def rq_lookup_codes(state: PQState, idx) -> jnp.ndarray:
    """(..., G) residual code indices -> (..., E) summed embeddings
    (reference ``quantize_all`` at vqvae_modules.py:673-679)."""
    emb = state.codebooks[0]  # (K, E)
    q = jnp.einsum("...gk,kd->...gd", jax.nn.one_hot(idx, emb.shape[0], dtype=emb.dtype), emb)
    return jnp.sum(q, axis=-2)


def _assign_residuals(codebooks, flat, depths: int, use_pallas):
    """Greedy residual assignment. flat: (N, E). Returns idx (N, depths),
    quant (N, E), residuals (depths, N, E) (pre-subtraction values)."""

    def body(carry, _):
        residual, quant = carry
        idx_i, q_i = pq_nearest_codes(residual[:, None, :], codebooks, use_pallas=use_pallas)
        idx_i, q_i = idx_i[:, 0], q_i[:, 0]
        return (residual - q_i, quant + q_i), (idx_i, residual, quant + q_i)

    (res, quant), (idxs, residuals, partials) = jax.lax.scan(
        body, (flat, jnp.zeros_like(flat)), None, length=depths
    )
    return jnp.moveaxis(idxs, 0, 1), quant, residuals, partials


def rq_forward_eval(state: PQState, x, depths: int, use_pallas: Optional[bool] = None):
    """x: (B, T, E) -> (quantized (B,T,E), indices (B,T,depths))."""
    b, t, e = x.shape
    flat = x.reshape(b * t, e).astype(jnp.float32)
    idx, quant, _, _ = _assign_residuals(state.codebooks, flat, depths, use_pallas)
    return quant.reshape(b, t, e).astype(x.dtype), idx.reshape(b, t, depths)


def rq_forward_train(
    state: PQState,
    x,
    key,
    depths: int,
    *,
    commitment_cost: float = 0.25,
    decay: float = 0.99,
    epsilon: float = 1e-5,
    axis_name: Optional[str] = None,
    use_pallas: Optional[bool] = None,
):
    """Train-mode RQ with shared-codebook EMA update.

    Mirrors the reference semantics: EMA stats are accumulated over ALL
    depths' (residual, index) pairs; commitment loss is the mean MSE between
    x and each partial reconstruction (vqvae_modules.py:659-665).
    """
    b, t, e = x.shape
    k = state.codebooks.shape[1]
    xf = x.astype(jnp.float32)
    flat = jax.lax.stop_gradient(xf).reshape(b * t, e)
    n = flat.shape[0]

    idx, quant, residuals, partials = _assign_residuals(
        state.codebooks, flat, depths, use_pallas
    )
    # Stats over all depths: (depths*N,) indices against their residual targets
    idx_all = idx.T.reshape(-1)                       # (depths*N,)
    res_all = residuals.reshape(-1, e)                # (depths*N, E)
    onehot = jax.nn.one_hot(idx_all, k, dtype=jnp.float32)
    counts = jnp.sum(onehot, axis=0)[None]            # (1, K)
    dw = jnp.einsum("nk,nd->kd", onehot, res_all)[None]  # (1, K, E)
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        dw = jax.lax.psum(dw, axis_name)

    counter = state.counter + 1
    bias = 1.0 - decay ** counter.astype(jnp.float32)
    ema_counts_h = state.ema_counts - (state.ema_counts - counts) * (1.0 - decay)
    ema_dw_h = state.ema_dw - (state.ema_dw - dw) * (1.0 - decay)
    avg_counts = ema_counts_h / bias
    avg_dw = ema_dw_h / bias

    ntot = jnp.sum(avg_counts, axis=-1, keepdims=True)
    smoothed = (avg_counts + epsilon) / (ntot + k * epsilon) * ntot
    new_codebooks = avg_dw / smoothed[..., None]

    reps = -(-k // max(n * depths, 1))
    cand = jnp.tile(res_all, (reps, 1))
    cand = jax.random.permutation(key, cand, axis=0)[:k][None]  # (1, K, E)
    cand = cand + jax.random.normal(key, cand.shape) * (0.01 / jnp.sqrt(e))
    if axis_name is not None:
        cand = jax.lax.pmean(cand, axis_name)
    usage = (smoothed >= 1.0).astype(jnp.float32)[..., None]
    new_codebooks = usage * new_codebooks + (1.0 - usage) * cand
    ema_dw_h = usage * ema_dw_h + (1.0 - usage) * cand
    ema_counts_h = usage[..., 0] * ema_counts_h + (1.0 - usage[..., 0])

    new_state = PQState(new_codebooks, ema_counts_h, ema_dw_h, counter)

    partials_btE = partials.reshape(depths, b, t, e)
    commit = commitment_cost * jnp.mean(
        (xf[None] - jax.lax.stop_gradient(partials_btE)) ** 2
    )
    quant_btE = quant.reshape(b, t, e)
    ste = xf + jax.lax.stop_gradient(quant_btE - xf)
    return ste.astype(x.dtype), new_state, commit, idx.reshape(b, t, depths)
