"""Device-resident windowed dataset — HBM-cached corpus, index-only steps.

TPU-native answer to the reference's ``DataLoader(num_workers=8)`` host
pipeline (``trainer/Trainer.py:156``): on a tunnel-attached TPU the
bottleneck is not producing a batch (the C++ loader does that in ~2 ms,
LOADER_BENCH.json) but *shipping* it — a B=8, T=176 fbhe+audio batch is
~2.5 MB, ~100 ms of host->device transfer per ~10 ms train step.

This module uploads the normalized corpus to HBM **once** and turns each
training step's data dependency into two ``(B,)`` int32 vectors (clip id,
window start — ~64 bytes). The window gather happens on device inside the
same XLA program as the train step (major-dim gather: batch and time are
leading axes, so it tiles cleanly; cf. the minor-dim gather trap in
CLAUDE.md).

Batch parity: normalization and fbhe composition are elementwise/column
selections, so they are precomputed per clip on host with the exact same
numpy ops ``WindowedDataset`` applies per window — slicing commutes with
them, making device batches bit-identical to ``fbhe_batches`` output
(tests/test_device_dataset.py). Index order + jitter reuse
``WindowedDataset.index_batches`` (same rng stream).

Capacity: the demo corpus is ~4 MB; guard against corpora that do not fit
HBM with ``max_bytes`` (falls back to the caller's host loader).
"""

from __future__ import annotations

import numpy as np

from probtalk_tpu.core import body_parts
from probtalk_tpu.data.dataset import WindowedDataset


def _compose_fbhe(poses_n: np.ndarray, expr_n: np.ndarray,
                  convert_to_6d: bool = True) -> np.ndarray:
    """(T, 330)+(T, 100) normalized -> (T, 376) fbhe, identical math to
    WindowedDataset.fbhe_batches (vq_teacher.py:148-157 composition)."""
    jaw_d = body_parts.each_dim(convert_to_6d)[0]
    idx = body_parts.c_index(convert_to_6d)
    return np.concatenate(
        [poses_n[..., :jaw_d], poses_n[..., idx], expr_n], axis=-1
    ).astype(np.float32)


class DeviceWindowedDataset:
    """HBM-resident fbhe windows over a clip corpus.

    Iterating yields the same ``{'poses_fbhe', 'aud_feat', 'speaker'}``
    batches as ``WindowedDataset.fbhe_batches`` — as committed device
    arrays produced by a jitted on-device gather.
    """

    def __init__(self, clips, mean, std, window: int = 180, stride: int = 6,
                 convert_to_6d: bool = True, max_bytes: int = 8 << 30):
        import jax
        import jax.numpy as jnp

        self._jnp = jnp
        self.window = int(window)
        # index/jitter source of truth — shares rng semantics with the
        # host loaders
        self.host = WindowedDataset(list(clips), window=window, stride=stride,
                                    mean=mean, std=std)

        t_max = max(c.poses.shape[0] for c in clips)
        ca = clips[0].aud_feat.shape[-1]
        n = len(clips)
        need = n * t_max * (376 + ca) * 4
        if need > max_bytes:
            raise MemoryError(
                f"corpus needs {need >> 20} MiB device-resident "
                f"(> max_bytes={max_bytes >> 20} MiB); use a host loader")

        fbhe = np.zeros((n, t_max, 376), np.float32)
        aud = np.zeros((n, t_max, ca), np.float32)
        spk = np.zeros((n,), np.int32)
        for i, c in enumerate(clips):
            t = c.poses.shape[0]
            p_n, e_n = self.host._normalize(c.poses, c.expression)
            fbhe[i, :t] = _compose_fbhe(
                p_n.astype(np.float32), e_n.astype(np.float32), convert_to_6d)
            aud[i, :t] = c.aud_feat[:t].astype(np.float32)
            spk[i] = int(c.speaker)
        self.fbhe = jax.device_put(fbhe)
        self.aud = jax.device_put(aud)
        self.speaker = jax.device_put(spk)

        w = self.window

        @jax.jit
        def gather(fbhe_d, aud_d, spk_d, clip_ids, starts):
            tidx = starts[:, None] + jnp.arange(w)[None, :]      # (B, W)
            return {
                "poses_fbhe": fbhe_d[clip_ids[:, None], tidx],
                "aud_feat": aud_d[clip_ids[:, None], tidx],
                "speaker": spk_d[clip_ids],
            }

        self._gather = gather

    def __len__(self):
        return len(self.host)

    def gather(self, clip_ids: np.ndarray, starts: np.ndarray) -> dict:
        """Device batch for explicit window coordinates."""
        jnp = self._jnp
        return self._gather(self.fbhe, self.aud, self.speaker,
                            jnp.asarray(clip_ids), jnp.asarray(starts))

    def fbhe_batches(self, batch_size: int, *, shuffle: bool = True,
                     seed: int = 0, drop_remainder: bool = True):
        """Same batches as ``WindowedDataset.fbhe_batches`` (bit-identical
        values, same rng), materialized on device."""
        for cids, starts in self.host.index_batches(
                batch_size, shuffle=shuffle, seed=seed,
                drop_remainder=drop_remainder):
            yield self.gather(cids, starts)
