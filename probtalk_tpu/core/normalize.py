"""Channel-wise z-score normalization with stat reindexing.

Capability of the reference's ``nets/utils.py:27-52`` (normalize /
denormalize with 'fbhe' / 'bh' stat sub-shapes) in (B, T, C) layout.
Stats come from the pinned ``data_utils/norm_stats.npy`` fixture or are
recomputed by the data pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

from probtalk_tpu.core import body_parts


def normalize(x, mean, std):
    """(..., C) channel-last z-score."""
    mean = jnp.reshape(mean, (1,) * (x.ndim - 1) + (-1,))
    std = jnp.reshape(std, (1,) * (x.ndim - 1) + (-1,))
    return (x - mean) / std


def denormalize(x, mean, std, shape: str = "all", idx=None):
    """Inverse z-score; ``shape`` selects the stat sub-layout.

    shape='fbhe': stats are reindexed [jaw | c_index | expression]
    shape='bh':   stats are taken at c_index only
    shape='all':  stats used as-is
    (reference: nets/utils.py:27-43)
    """
    mean = jnp.asarray(mean).reshape(-1)
    std = jnp.asarray(std).reshape(-1)
    if shape == "fbhe":
        mean = body_parts.tofbhe(mean, idx)
        std = body_parts.tofbhe(std, idx)
    elif shape == "bh":
        mean = mean[idx]
        std = std[idx]
    mean = jnp.reshape(mean, (1,) * (x.ndim - 1) + (-1,))
    std = jnp.reshape(std, (1,) * (x.ndim - 1) + (-1,))
    return x * std + mean
