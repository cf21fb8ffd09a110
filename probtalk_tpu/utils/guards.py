"""Numerical-safety guards.

Generalizes the reference's lone NaN check (``nets/smplx_body_pixel.py:
189-190``: skip the optimizer step when a grad is NaN) into a reusable
optax wrapper plus batch validators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def skip_nonfinite_updates(tx: optax.GradientTransformation
                           ) -> optax.GradientTransformation:
    """Wrap a transform: if any gradient is non-finite, apply a zero update
    (and keep optimizer state unchanged) instead of poisoning the params."""

    def init(params):
        return tx.init(params)

    def update(grads, state, params=None):
        leaves = jax.tree_util.tree_leaves(grads)
        ok = jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in leaves]))
        updates, new_state = tx.update(grads, state, params)

        def pick(u):
            return jnp.where(ok, u, jnp.zeros_like(u))

        updates = jax.tree_util.tree_map(pick, updates)
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o) if hasattr(n, "dtype") else n,
            new_state, state,
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


def assert_finite(tree, name: str = "tree"):
    """Host-side check (debug/test use)."""
    bad = [
        p for p, leaf in jax.tree_util.tree_leaves_with_path(tree)
        if hasattr(leaf, "dtype") and not bool(jnp.all(jnp.isfinite(leaf)))
    ]
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")
