"""Sequence-sharded whole-clip refinement.

The TPU-native answer to the reference's window tiling for long clips
(SURVEY §2.3 stretch): instead of slicing a long sequence into 180-frame
windows host-side (``refiner.py:611-614``), shard the TIME axis of one long
sequence across the mesh and let XLA partition the transformer —
attention's (T x T) score einsums become collective-permuted partial
matmuls over ICI automatically under pjit.

This gives bit-identical results to the unsharded forward (it is the same
program, partitioned), removing window seams entirely for clips up to the
PE capacity (1800 frames).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sequence_parallel_refine(stage, mesh: Mesh, axis: str = "data"):
    """Jitted refiner forward with inputs sharded along time.

    stage: RefinerStage; mesh with the sharding axis. Inputs
    (prelim, aud, mask) are (B, T, C) with T sharded; params replicated.
    """
    x_shard = NamedSharding(mesh, P(None, axis, None))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def refine(variables, prelim, aud, mask, speaker):
        prelim = jax.lax.with_sharding_constraint(prelim, x_shard)
        aud = jax.lax.with_sharding_constraint(aud, x_shard)
        mask = jax.lax.with_sharding_constraint(mask, x_shard)
        out = stage.apply(variables, prelim, aud, mask, speaker, train=False)
        return jax.lax.with_sharding_constraint(out, x_shard)

    def run(variables, prelim, aud, mask, speaker):
        variables = jax.device_put(variables, rep)
        prelim = jax.device_put(prelim, x_shard)
        aud = jax.device_put(aud, x_shard)
        mask = jax.device_put(mask, x_shard)
        speaker = jax.device_put(speaker, rep)
        return refine(variables, prelim, aud, mask, speaker)

    return run
