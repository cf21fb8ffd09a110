"""Flat-numpy checkpointing for big TrainStates on slow-CPU hosts.

Orbax (``train/trainer.Checkpointer``) is the durable, user-facing format
(chunked OCDBT + compression), but its serialization is CPU-bound: on a
1-core host a ~600 MB TrainState takes 10+ minutes to write — more than
the training compute between saves in a telemetry campaign. This module
trades the format features for raw speed: one uncompressed ``.npz`` of
the flattened leaves (bulk ``jax.device_get``, sequential write, atomic
rename), which is seconds instead of minutes for the same state.

Restore mirrors the Checkpointer API: the caller supplies a template
state with the same pytree structure; leaves are loaded positionally.
Use for in-run resume points (long campaigns, ablation arms); keep orbax
for checkpoints that outlive the script that wrote them.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax


class FastCkpt:
    """Single-slot step checkpoint: ``path.npz`` holds the latest save."""

    def __init__(self, path: str):
        self.path = path if path.endswith(".npz") else path + ".npz"

    def save(self, step: int, state) -> None:
        leaves = jax.tree.leaves(state)
        host = jax.device_get(leaves)              # one bulk D2H fetch
        tmp = self.path + ".tmp.npz"
        np.savez(tmp, __step=np.int64(step), __n=np.int64(len(host)),
                 **{f"a{i}": np.asarray(x) for i, x in enumerate(host)})
        os.replace(tmp, self.path)                 # atomic: never half-saved

    def restore(self, template) -> Tuple[Optional[object], int]:
        """Returns (state, step) or (None, -1) when no checkpoint exists.
        ``template`` must have the same pytree structure as what was
        saved (leaves are matched positionally).

        Leaves come back as HOST numpy arrays (np.load mmap semantics).
        Callers that keep using the state in jitted code must
        ``jax.device_put`` the tree ONCE — numpy leaves in jit arguments
        are re-uploaded on every call, which over the axon tunnel turns a
        ~25 ms train step into ~10 s for a 468 MB state."""
        if not os.path.exists(self.path):
            return None, -1
        with np.load(self.path) as z:
            leaves, treedef = jax.tree.flatten(template)
            n = int(z["__n"])
            if n != len(leaves):
                raise ValueError(
                    f"{self.path}: saved {n} leaves, template has "
                    f"{len(leaves)} — structure changed since the save")
            new = [z[f"a{i}"] for i in range(n)]
            return jax.tree.unflatten(treedef, new), int(z["__step"])
