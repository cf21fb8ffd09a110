"""Native C++ loader tests: pack format, batch correctness vs numpy path."""

import os

import numpy as np
import pytest

from probtalk_tpu.core import body_parts
from probtalk_tpu.data.dataset import ClipData, WindowedDataset
from probtalk_tpu.data.native_loader import NativeLoader, pack_dataset, build_native


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    rng = np.random.default_rng(0)
    clips = []
    for i, frames in enumerate([120, 90]):
        clips.append(ClipData(
            poses=rng.normal(size=(frames, 330)).astype(np.float32),
            expression=rng.normal(size=(frames, 100)).astype(np.float32),
            aud_feat=rng.normal(size=(frames, 64)).astype(np.float32),
            betas=np.zeros(300, np.float32), speaker=i,
        ))
    mean = rng.normal(size=430).astype(np.float32)
    std = rng.uniform(0.5, 2.0, size=430).astype(np.float32)
    path = str(tmp_path_factory.mktemp("ds") / "train.ptlk")
    pack_dataset(path, clips, mean, std)
    return path, clips, mean, std


class TestNativeLoader:
    def test_counts_match_numpy_dataset(self, packed):
        path, clips, mean, std = packed
        loader = NativeLoader(path, window=30, stride=6, batch=4, shuffle=False)
        ds = WindowedDataset(clips, window=30, stride=6, mean=mean, std=std,
                             jitter=False)
        assert loader.num_batches() == len(ds) // 4

    def test_batches_match_numpy_path(self, packed):
        path, clips, mean, std = packed
        loader = NativeLoader(path, window=30, stride=6, batch=4, shuffle=False)
        ds = WindowedDataset(clips, window=30, stride=6, mean=mean, std=std,
                             jitter=False)
        ref_iter = ds.fbhe_batches(4, shuffle=False, drop_remainder=True)
        n = 0
        for native_b, ref_b in zip(loader, ref_iter):
            np.testing.assert_allclose(native_b["poses_fbhe"],
                                       ref_b["poses_fbhe"], atol=1e-6)
            np.testing.assert_allclose(native_b["aud_feat"],
                                       ref_b["aud_feat"], atol=1e-6)
            np.testing.assert_array_equal(native_b["speaker"], ref_b["speaker"])
            assert native_b["poses_fbhe"].shape == (4, 30, 376)
            n += 1
        assert n == loader.num_batches()

    def test_shuffled_epoch_covers_batches(self, packed):
        path, clips, mean, std = packed
        loader = NativeLoader(path, window=30, stride=6, batch=4, seed=1,
                              shuffle=True)
        batches = list(loader)
        assert len(batches) == loader.num_batches()
        assert all(np.all(np.isfinite(b["poses_fbhe"])) for b in batches)

    def test_different_seeds_differ(self, packed):
        path, clips, mean, std = packed
        b1 = next(iter(NativeLoader(path, window=30, stride=6, batch=4, seed=1)))
        b2 = next(iter(NativeLoader(path, window=30, stride=6, batch=4, seed=2)))
        assert not np.allclose(b1["poses_fbhe"], b2["poses_fbhe"])
