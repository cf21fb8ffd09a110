"""Per-stage jitted train steps.

One generic pattern (value_and_grad over a stage loss; AdamW+clip update;
mutable collections threaded through) instantiated per stage — replacing
the reference's per-wrapper ``__call__``-does-backward design
(``nets/inpainting/vq_teacher.py:135-182`` etc.) with pure functions that
pjit shards over the data mesh axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from probtalk_tpu.train import losses
from probtalk_tpu.train.state import TrainState


def make_vq_train_step(model, vq_type: str = "fbhe", convert_to_6d: bool = True,
                       donate: bool = True, each_dim=None):
    """Train step for the PQ-VAE stage (s2g_body_vqt).

    batch: {'poses_fbhe': (B, T, C)} already composed/normalized.
    Returns (new_state, metrics).
    """

    def loss_fn(params, mutables, batch, rng):
        variables = {"params": params, **mutables}
        (pred, commit, _idx), new_mut = model.apply(
            variables, batch["poses_fbhe"], train=True,
            noise_ratio=batch.get("noise_ratio", 0.0),
            mutable=["quant", "batch_stats"],
            rngs={"quant": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        rec, ld = losses.vq_recon_loss(pred, batch["poses_fbhe"], vq_type,
                                       convert_to_6d, each_dim=each_dim)
        total = rec + commit
        ld["commit_loss"] = commit
        ld["loss"] = total
        return total, (new_mut, ld)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.mutables, batch, rng
        )
        new_state = state.apply_gradients(grads, new_mutables=new_mut)
        ld["grad_norm"] = optax_global_norm(grads)
        return new_state, ld

    return step


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_recon_fn(model):
    """Jitted eval: reconstruct and report L1 'capacity'
    (the reference's scripts/test_vq.py:54 metric)."""

    @jax.jit
    def recon(state: TrainState, poses):
        variables = {"params": state.params, **state.mutables}
        pred, _, idx = model.apply(variables, poses, train=False)
        return pred, jnp.mean(jnp.abs(pred - poses)), idx

    return recon
