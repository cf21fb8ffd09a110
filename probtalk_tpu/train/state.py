"""Train state: params + optimizer + mutable collections as one pytree.

Replaces the reference's wrapper-owned torch optimizers
(``nets/base.py:16-28``, per-wrapper AdamW at ``predictor.py:109-118``)
with a single functional state threaded through jitted steps and
checkpointed as a whole by orbax.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    mutables: Any  # {'batch_stats': ..., 'quant': ...} — non-grad model state
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_mutables=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            mutables=new_mutables if new_mutables is not None else self.mutables,
        )


def adamw(lr: float = 1e-4, b1: float = 0.9, b2: float = 0.99,
          max_grad_norm: float = 5.0) -> optax.GradientTransformation:
    """AdamW + global-norm clipping — the reference training envelope
    (config/transformer.json: lr 1e-4, betas (0.9, 0.99), clip 5)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr, b1=b1, b2=b2),
    )


def create_train_state(model, sample_batch_args: tuple, rng,
                       tx: optax.GradientTransformation,
                       init_kwargs: dict | None = None) -> TrainState:
    """Initialize model variables and wrap them in a TrainState."""
    rngs = {"params": rng, "quant": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2)}
    variables = model.init(rngs, *sample_batch_args, **(init_kwargs or {}))
    params = variables.pop("params")
    mutables = dict(variables)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        mutables=mutables,
        tx=tx,
    )
