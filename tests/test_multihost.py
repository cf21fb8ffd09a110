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


def _mk_clips(rng, frames_list):
    from probtalk_tpu.data.dataset import ClipData

    return [ClipData(
        poses=rng.normal(size=(t, 330)).astype(np.float32),
        expression=rng.normal(size=(t, 100)).astype(np.float32),
        aud_feat=rng.normal(size=(t, 8)).astype(np.float32),
        betas=np.zeros(300, np.float32), speaker=0, name=f"c{i:03d}")
        for i, t in enumerate(frames_list)]


class TestShardManifest:
    """Round-3 hardening: deterministic frame-balanced manifests +
    SPMD-safe epoch lengths for uneven shards."""

    def test_manifest_deterministic_and_balanced(self, rng):
        from probtalk_tpu.data.multihost import build_manifest

        clips = _mk_clips(rng, [300, 40, 200, 120, 90, 250, 60, 80])
        m1 = build_manifest(clips, 4)
        m2 = build_manifest(list(reversed(clips)), 4)   # order-independent
        assert m1 == m2
        loads = {}
        for e in m1.values():
            loads[e["host"]] = loads.get(e["host"], 0) + e["frames"]
        assert set(loads) == {0, 1, 2, 3}
        assert max(loads.values()) - min(loads.values()) <= 300

    def test_manifest_roundtrip_and_unknown_clip(self, rng, tmp_path):
        from probtalk_tpu.data.multihost import (
            build_manifest, clips_for_host, load_manifest, save_manifest,
        )

        clips = _mk_clips(rng, [100, 100, 100])
        m = build_manifest(clips, 2)
        p = str(tmp_path / "manifest.json")
        save_manifest(m, p)
        assert load_manifest(p) == m
        shards = [clips_for_host(clips, m, h) for h in range(2)]
        assert sorted(c.name for s in shards for c in s) == \
            [c.name for c in clips]
        import dataclasses

        import pytest as _pytest

        new_clip = dataclasses.replace(clips[0], name="unseen_clip")
        with _pytest.raises(KeyError):
            clips_for_host(clips + [new_clip], m, 0)

    def test_steps_per_epoch_syncs_uneven_shards(self, rng):
        from probtalk_tpu.data.dataset import WindowedDataset
        from probtalk_tpu.data.multihost import (
            build_manifest, clips_for_host, multihost_batches,
            steps_per_epoch,
        )

        # deliberately unbalanceable: one long clip vs two short ones
        clips = _mk_clips(rng, [400, 60, 60])
        m = build_manifest(clips, 2)
        steps = steps_per_epoch(m, window=16, stride=6, per_host_batch=8)
        assert steps >= 1
        mesh = make_mesh(data=8)
        for host in range(2):
            local = clips_for_host(clips, m, host)
            ds = WindowedDataset(local, window=16, stride=6)
            got = list(multihost_batches(ds, 8, mesh, steps=steps))
            # EVERY host yields exactly `steps` batches (cycling if short)
            assert len(got) == steps

    def test_pack_host_shard_feeds_native_loader(self, rng, tmp_path):
        from probtalk_tpu.data.multihost import (
            build_manifest, pack_host_shard,
        )
        from probtalk_tpu.data.native_loader import NativeLoader

        clips = _mk_clips(rng, [120, 90])
        m = build_manifest(clips, 2)
        mean = np.zeros(430, np.float32)
        std = np.ones(430, np.float32)
        p = str(tmp_path / "shard0.ptlk")
        pack_host_shard(p, clips, m, mean, std, process_index=0)
        loader = NativeLoader(p, window=16, stride=6, batch=4, seed=0)
        b = next(iter(loader))
        assert b["poses_fbhe"].shape == (4, 16, 376)
