"""Device-mesh layer: the framework's distributed substrate.

The reference parallelizes with single-process ``torch.nn.DataParallel``
(``trainer/Trainer.py:52-53``). Here scaling is a first-class
``jax.sharding.Mesh``:

  * ``data`` axis — batch-sharded training and sample-parallel inference
    (the B=16 diversity samples of the eval harness map onto it directly);
  * ``model`` axis — reserved for tensor-parallel sharding of the larger
    transformer variants (unused at reference scale, plumbed through so
    pjit can partition if configured).

Everything rides XLA collectives over ICI; no NCCL analogue exists or is
needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model <= len(devices), (data, model, len(devices))
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_spec(ndim: int, batch_axis: int = 0) -> P:
    """PartitionSpec sharding one axis over 'data', rest replicated."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return P(*spec)


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Place a pytree of host arrays batch-sharded over the mesh.

    One batched ``jax.device_put`` call for the whole tree — per-leaf
    puts serialize one blocking transfer each, which on a loaded 1-core
    host blew the driver's dryrun budget (MULTICHIP_r03 rc=124)."""

    def shard_of(x):
        if np.ndim(x) <= batch_axis:  # scalars etc. -> replicated
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, data_spec(np.ndim(x), batch_axis))

    return jax.device_put(batch, jax.tree_util.tree_map(shard_of, batch))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh (one batched put)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
