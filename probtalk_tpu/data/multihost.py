"""Multi-host data loading: per-host shards -> globally sharded batches.

The reference is single-process (SURVEY §2.3); this is the TPU-native
scale-out path for multi-host pods: each host loads only its shard of the
clip list, builds host-local batches, and assembles them into one GLOBAL
jax.Array batch-sharded over the mesh 'data' axis with
``jax.make_array_from_process_local_data`` — batches ride host DRAM ->
local chips; only gradients cross DCN.

DCN-scale invariants this module maintains (round-3 hardening):
  * **Deterministic, persistent shard manifest** (``build_manifest`` /
    ``save_manifest``): clip->host assignment is frame-balanced (greedy
    longest-first) and keyed by sorted clip names, so every restart and
    every host derives the same assignment; a saved manifest pins it
    across dataset growth.
  * **Synchronized epoch length** (``steps_per_epoch``): every host
    computes the same step count from the manifest alone (no collective
    needed); hosts with fewer local windows cycle, so a short shard can
    never desync the SPMD step loop (an uneven shard would otherwise hang
    every other host at the epoch boundary).
  * **Native-loader shards** (``pack_host_shard``): each host packs only
    its manifest slice for the C++ double-buffered loader.

On a single host this degrades exactly to ``shard_batch`` (tested); the
assembly API is identical, so training loops are host-count agnostic.
"""

from __future__ import annotations

import json
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


# ---------------------------------------------------------------------------
# shard manifests
# ---------------------------------------------------------------------------

def _clip_name(c, i):
    return getattr(c, "name", None) or f"clip_{i:05d}"


def _clip_frames(c):
    return int(np.asarray(getattr(c, "poses")).shape[0])


def build_manifest(clips: Sequence, process_count: int) -> dict:
    """Deterministic frame-balanced assignment: {name: {host, frames}}.

    Greedy longest-first over name-sorted clips — every host computes the
    identical manifest from the same clip list, no coordination needed.
    """
    entries = sorted(
        ((_clip_name(c, i), _clip_frames(c)) for i, c in enumerate(clips)),
        key=lambda e: (-e[1], e[0]))
    load = [0] * process_count
    manifest = {}
    for name, frames in entries:
        host = int(np.argmin(load))
        load[host] += frames
        manifest[name] = {"host": host, "frames": frames}
    return manifest


def save_manifest(manifest: dict, path: str):
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


def load_manifest(path: str) -> dict:
    return json.load(open(path))


def clips_for_host(clips: Sequence, manifest: dict,
                   process_index: Optional[int] = None) -> list:
    """This host's manifest slice. Clips absent from the manifest raise —
    a grown dataset must rebuild (or extend) the manifest explicitly."""
    pi = jax.process_index() if process_index is None else process_index
    out = []
    for i, c in enumerate(clips):
        name = _clip_name(c, i)
        if name not in manifest:
            raise KeyError(
                f"clip {name!r} not in shard manifest — rebuild the "
                "manifest (build_manifest) before training on new data")
        if manifest[name]["host"] == pi:
            out.append(c)
    return out


def _host_windows(manifest: dict, host: int, window: int,
                  stride: int) -> int:
    """Window count of one host's shard, computed from the manifest alone
    (mirrors WindowedDataset's per-clip count: len = (T - window)//stride
    + 1 for T >= window)."""
    n = 0
    for e in manifest.values():
        if e["host"] == host and e["frames"] >= window:
            n += (e["frames"] - window) // stride + 1
    return n


def steps_per_epoch(manifest: dict, window: int, stride: int,
                    per_host_batch: int) -> int:
    """The SPMD-safe epoch length: min over hosts of full local batches.
    Every host computes this identically from the manifest — short shards
    cycle up to it, long shards truncate down to it, so all hosts enter
    the same number of collectives per epoch."""
    hosts = {e["host"] for e in manifest.values()}
    return min(_host_windows(manifest, h, window, stride) // per_host_batch
               for h in sorted(hosts))


def pack_host_shard(path: str, clips: Sequence, manifest: dict, mean, std,
                    process_index: Optional[int] = None) -> str:
    """Pack THIS host's manifest slice for the native C++ loader
    (data/native_loader.pack_dataset) — the per-host file the
    double-buffered producer streams."""
    from probtalk_tpu.data.native_loader import pack_dataset

    local = clips_for_host(clips, manifest, process_index)
    pack_dataset(path, local, mean, std)
    return path


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
                      seed: int = 0, steps: Optional[int] = None,
                      **kw) -> Iterator[dict]:
    """Iterate globally-sharded batches from a host-local WindowedDataset.

    Seed is offset by process_index so hosts draw disjoint window orders
    even when clip shards overlap. ``steps`` (from ``steps_per_epoch``)
    pins the epoch length: a host with fewer local batches CYCLES (re-
    drawing with a bumped seed) and one with more truncates, so every
    host executes exactly ``steps`` collectives."""
    host_seed = seed * 1000 + jax.process_index()
    if steps is None:
        for b in dataset.batches(per_host_batch, seed=host_seed, **kw):
            yield assemble_global_batch(b, mesh)
        return
    emitted = 0
    while emitted < steps:
        any_local = False
        for b in dataset.batches(per_host_batch, seed=host_seed, **kw):
            any_local = True
            yield assemble_global_batch(b, mesh)
            emitted += 1
            if emitted == steps:
                return
        if not any_local:
            raise RuntimeError("host shard yields no full batches; lower "
                               "per_host_batch or rebalance the manifest")
        host_seed += 1   # cycle with a fresh shuffle
