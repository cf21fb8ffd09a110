"""Device-resident dataset == host WindowedDataset, bit for bit.

The HBM-cached corpus (data/device_dataset.py) must reproduce the host
loader's batches exactly — same rng stream (shuffle + jitter draws), same
normalization/fbhe math — so campaigns can switch loaders without changing
the training trajectory.
"""

import numpy as np
import pytest

from probtalk_tpu.data.dataset import ClipData, WindowedDataset
from probtalk_tpu.data.device_dataset import DeviceWindowedDataset

pytestmark = pytest.mark.smoke

WINDOW, STRIDE, BS = 30, 6, 4


def _clips(n=3, seed=0):
    rng = np.random.default_rng(seed)
    clips = []
    for i in range(n):
        t = 60 + 17 * i
        clips.append(ClipData(
            poses=rng.normal(size=(t, 330)),
            expression=rng.normal(size=(t, 100)),
            aud_feat=rng.normal(size=(t, 16)).astype(np.float32),
            betas=np.zeros(300, np.float32), speaker=i, name=f"c{i}"))
    mean = rng.normal(size=430)
    std = rng.uniform(0.5, 2.0, size=430)
    return clips, mean, std


@pytest.mark.parametrize("shuffle", [True, False])
def test_device_batches_bit_identical(shuffle):
    clips, mean, std = _clips()
    host = WindowedDataset(clips, window=WINDOW, stride=STRIDE,
                           mean=mean, std=std)
    dev = DeviceWindowedDataset(clips, mean, std, window=WINDOW,
                                stride=STRIDE)
    h = list(host.fbhe_batches(BS, seed=7, shuffle=shuffle))
    d = list(dev.fbhe_batches(BS, seed=7, shuffle=shuffle))
    assert len(h) == len(d) > 0
    for hb, db in zip(h, d):
        np.testing.assert_array_equal(hb["poses_fbhe"],
                                      np.asarray(db["poses_fbhe"]))
        np.testing.assert_array_equal(hb["aud_feat"],
                                      np.asarray(db["aud_feat"]))
        np.testing.assert_array_equal(hb["speaker"],
                                      np.asarray(db["speaker"]))


def test_index_batches_match_batches():
    """index_batches consumes the rng exactly like batches()."""
    clips, mean, std = _clips(seed=3)
    ds = WindowedDataset(clips, window=WINDOW, stride=STRIDE,
                         mean=mean, std=std)
    mats = list(ds.batches(BS, seed=11))
    idxs = list(ds.index_batches(BS, seed=11))
    assert len(mats) == len(idxs)
    for mb, (cids, starts) in zip(mats, idxs):
        for b in range(BS):
            clip = clips[cids[b]]
            sl = slice(starts[b], starts[b] + WINDOW)
            np.testing.assert_array_equal(
                mb["aud_feat"][b], clip.aud_feat[sl].astype(np.float32))
            assert mb["speaker"][b] == clip.speaker


def test_memory_guard():
    clips, mean, std = _clips()
    with pytest.raises(MemoryError):
        DeviceWindowedDataset(clips, mean, std, window=WINDOW,
                              max_bytes=1024)
