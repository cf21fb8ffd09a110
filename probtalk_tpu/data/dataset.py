"""Windowed motion dataset + batching iterator.

Capability of the reference's ``MultiVidData`` + ``__Worker__``
(``data_utils/dataloader_torch.py``, ``mesh_dataset.py:266-366``): walks a
split of preprocessed clips, emits stride-6 windows of ``generate_length``
frames with aligned audio features, z-score normalization, speaker ids, and
random window jitter at train time.

Host-side numpy only; batches feed ``jax.device_put`` / ``shard_batch``.
The double-buffered prefetch lives in ``probtalk_tpu.data.loader``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

from probtalk_tpu.core import body_parts


@dataclass
class ClipData:
    """One preprocessed clip (see data.preprocess.preprocess_clip)."""

    poses: np.ndarray        # (T, 330)
    expression: np.ndarray   # (T, 100)
    aud_feat: np.ndarray     # (T, Ca)
    betas: np.ndarray        # (300,)
    speaker: int = 0
    name: str = ""
    text_feat: Optional[np.ndarray] = None
    onset_times: Optional[np.ndarray] = None   # audio onsets (s), for BC


@dataclass
class WindowedDataset:
    """Stride-indexed fixed-length windows over a list of clips."""

    clips: list
    window: int = 180            # generate_length (config/transformer.json:23)
    stride: int = 6              # reference __Worker__ index stride
    mean: Optional[np.ndarray] = None    # (430,) normalization stats
    std: Optional[np.ndarray] = None
    jitter: bool = True          # random window offset at train time
    _index: list = field(default_factory=list)

    def __post_init__(self):
        for ci, clip in enumerate(self.clips):
            t = clip.poses.shape[0]
            for s in range(0, max(t - self.window, 0) + 1, self.stride):
                self._index.append((ci, s))

    def __len__(self):
        return len(self._index)

    def _normalize(self, poses, expression):
        if self.mean is None:
            return poses, expression
        full = np.concatenate([poses, expression], axis=-1)
        full = (full - self.mean) / self.std
        return full[:, : poses.shape[1]], full[:, poses.shape[1]:]

    def get(self, i: int, rng: Optional[np.random.Generator] = None) -> dict:
        ci, start = self._index[i]
        clip = self.clips[ci]
        t = clip.poses.shape[0]
        if self.jitter and rng is not None and t > self.window:
            max_start = t - self.window
            lo = max(start - self.stride + 1, 0)
            hi = min(start + self.stride, max_start + 1)
            start = int(rng.integers(lo, hi))
        sl = slice(start, start + self.window)
        poses, expression = self._normalize(clip.poses[sl], clip.expression[sl])
        item = {
            "poses": poses.astype(np.float32),
            "expression": expression.astype(np.float32),
            "aud_feat": clip.aud_feat[sl].astype(np.float32),
            "speaker": np.int32(clip.speaker),
            "betas": clip.betas.astype(np.float32),
        }
        if clip.text_feat is not None:
            item["text_feat"] = clip.text_feat[sl].astype(np.float32)
        return item

    # ------------------------------------------------------------------
    def batches(self, batch_size: int, *, shuffle: bool = True, seed: int = 0,
                drop_remainder: bool = True) -> Iterator[dict]:
        """Yield stacked batch dicts. Uses numpy only — feed to shard_batch."""
        rng = np.random.default_rng(seed)
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        n = len(order)
        end = n - n % batch_size if drop_remainder else n
        for i in range(0, end, batch_size):
            items = [self.get(int(j), rng if shuffle else None)
                     for j in order[i: i + batch_size]]
            yield {
                k: np.stack([it[k] for it in items]) for k in items[0]
            }

    def index_batches(self, batch_size: int, *, shuffle: bool = True,
                      seed: int = 0, drop_remainder: bool = True
                      ) -> Iterator[tuple]:
        """Yield ``(clip_ids, starts)`` int32 pairs — the window coordinates
        ``batches`` would materialize, with bit-identical rng consumption
        (same shuffle draw, same per-item jitter draws). Feed to
        ``DeviceWindowedDataset.gather`` so only ~8 bytes/sample cross the
        host->device tunnel instead of the full window tensors."""
        rng = np.random.default_rng(seed)
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        n = len(order)
        end = n - n % batch_size if drop_remainder else n
        for i in range(0, end, batch_size):
            cids, starts = [], []
            for j in order[i: i + batch_size]:
                ci, start = self._index[int(j)]
                t = self.clips[ci].poses.shape[0]
                if self.jitter and shuffle and t > self.window:
                    max_start = t - self.window
                    lo = max(start - self.stride + 1, 0)
                    hi = min(start + self.stride, max_start + 1)
                    start = int(rng.integers(lo, hi))
                cids.append(ci)
                starts.append(start)
            yield (np.asarray(cids, np.int32), np.asarray(starts, np.int32))

    def fbhe_batches(self, batch_size: int, convert_to_6d: bool = True, **kw):
        """Batches with poses pre-composed to the 376-d fbhe layout
        (jaw | c_index body+hand | expression) — the per-batch composition
        every reference wrapper does on device (vq_teacher.py:148-157)."""
        jaw_d = body_parts.each_dim(convert_to_6d)[0]
        idx = body_parts.c_index(convert_to_6d)
        for batch in self.batches(batch_size, **kw):
            poses = batch.pop("poses")
            expr = batch.pop("expression")
            batch["poses_fbhe"] = np.concatenate(
                [poses[..., :jaw_d], poses[..., idx], expr], axis=-1
            )
            yield batch
