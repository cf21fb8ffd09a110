"""Multi-host data assembly (single-host degenerate case + shard math)."""

import numpy as np
import jax
import jax.numpy as jnp

from probtalk_tpu.data.multihost import (
    assemble_global_batch, global_batch_size, multihost_batches, shard_clips,
)
from probtalk_tpu.parallel import make_mesh


def test_shard_clips_partition():
    clips = list(range(10))
    shards = [shard_clips(clips, i, 4) for i in range(4)]
    assert sorted(sum(shards, [])) == clips
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1
    assert global_batch_size(8, 4) == 32


def test_assemble_matches_shard_batch(rng):
    mesh = make_mesh(data=8)
    batch = {"x": rng.normal(size=(16, 5, 3)).astype(np.float32),
             "s": np.float32(0.5)}
    g = assemble_global_batch(batch, mesh)
    assert g["x"].shape == (16, 5, 3)
    np.testing.assert_allclose(np.asarray(g["x"]), batch["x"])
    assert float(g["s"]) == 0.5
    # sharded over 'data': 8 distinct single-device shards
    assert len(g["x"].sharding.device_set) == 8

    # feeds jitted reductions like any sharded batch
    out = jax.jit(lambda b: jnp.sum(b["x"]) * b["s"])(g)
    np.testing.assert_allclose(float(out), batch["x"].sum() * 0.5, rtol=1e-5)


def test_multihost_batches_iterator(rng):
    from probtalk_tpu.data.dataset import ClipData, WindowedDataset

    mesh = make_mesh(data=8)
    clips = [ClipData(
        poses=rng.normal(size=(70, 330)).astype(np.float32),
        expression=rng.normal(size=(70, 100)).astype(np.float32),
        aud_feat=rng.normal(size=(70, 8)).astype(np.float32),
        betas=np.zeros(300, np.float32), speaker=0)]
    ds = WindowedDataset(shard_clips(clips), window=16, stride=6)
    batches = list(multihost_batches(ds, 8, mesh))
    assert batches
    assert batches[0]["poses"].shape[0] == 8 * jax.process_count()
