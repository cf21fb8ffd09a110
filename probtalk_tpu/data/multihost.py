"""Multi-host data loading: per-host shards -> globally sharded batches.

The reference is single-process (SURVEY §2.3); this is the TPU-native
scale-out path for multi-host pods: each host loads only its shard of the
clip list (round-robin by ``jax.process_index()``), builds host-local
batches, and assembles them into one GLOBAL jax.Array batch-sharded over
the mesh 'data' axis with ``jax.make_array_from_process_local_data`` —
batches ride host DRAM -> local chips; only gradients cross DCN.

On a single host this degrades exactly to ``shard_batch`` (tested); the
assembly API is identical, so training loops are host-count agnostic.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_clips(clips: Sequence, process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> list:
    """Round-robin clip assignment for this host."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [c for i, c in enumerate(clips) if i % pc == pi]


def global_batch_size(per_host_batch: int,
                      process_count: Optional[int] = None) -> int:
    pc = jax.process_count() if process_count is None else process_count
    return per_host_batch * pc


def assemble_global_batch(local_batch: dict, mesh: Mesh,
                          batch_axis: int = 0) -> dict:
    """Host-local numpy batch (per-host slice of the global batch) ->
    pytree of GLOBAL jax.Arrays sharded over 'data'. Scalars replicate."""
    def put(x):
        x = np.asarray(x)
        if x.ndim <= batch_axis:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * x.ndim
        spec[batch_axis] = "data"
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*spec)), x)

    return jax.tree_util.tree_map(put, local_batch)


def multihost_batches(dataset, per_host_batch: int, mesh: Mesh, *,
                      seed: int = 0, **kw) -> Iterator[dict]:
    """Iterate globally-sharded batches from a host-local WindowedDataset.

    Seed is offset by process_index so hosts draw disjoint window orders
    even when clip shards overlap."""
    host_seed = seed * 1000 + jax.process_index()
    for b in dataset.batches(per_host_batch, seed=host_seed, **kw):
        yield assemble_global_batch(b, mesh)
