"""Time-axis linear interpolation (torch F.interpolate(mode='linear') analogue)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_time(x, t_out: int):
    """Linearly resample (B, T, C) -> (B, t_out, C) with half-pixel centers
    (align_corners=False semantics)."""
    b, t, c = x.shape
    if t == t_out:
        return x
    return jax.image.resize(x, (b, t_out, c), method="linear")
