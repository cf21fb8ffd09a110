"""Classic single-codebook VQ-VAE EMA layer.

Capability of the reference's ``VectorQuantizerEMA``
(``nets/spg/vqvae_modules.py:279-377``), used by the legacy TalkSHOW stages
(s2g_body_vq / s2g_body_pixel). Implemented as the G=1 special case of the
product quantizer — identical math, one codebook over the full embedding.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from probtalk_tpu.quant import pq


def vq_init(key, num_codes: int, embedding_dim: int) -> pq.PQState:
    return pq.pq_init(key, 1, num_codes, embedding_dim)


def vq_forward_train(state: pq.PQState, x, key, **kw):
    """x: (B, T, E) -> (ste, new_state, commit_loss, indices (B, T))."""
    ste, new_state, commit, idx = pq.pq_forward_train(state, x, key, **kw)
    return ste, new_state, commit, idx[..., 0]


def vq_forward_eval(state: pq.PQState, x, **kw):
    quant, idx = pq.pq_forward_eval(state, x, **kw)
    return quant, idx[..., 0]


def vq_lookup_codes(state: pq.PQState, idx) -> jnp.ndarray:
    """(...,) indices -> (..., E) embeddings."""
    return pq.pq_lookup_codes(state, idx[..., None])
