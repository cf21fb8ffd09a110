"""ctypes bridge to the native C++ batch loader.

The runtime-native replacement for the reference's torch DataLoader worker
pool (``trainer/Trainer.py:init_dataloader`` with num_workers=8): the C++
side (``probtalk_tpu/native/loader.cpp``) owns the window index, jitter,
shuffling, and batch assembly in a double-buffered producer thread; python
just hands the filled buffers to ``jax.device_put``.

Packed dataset format (written by ``pack_dataset``):
  u64 magic "PTLKDS01" | i64 n_clips | i64 pose_dim | i64 aud_dim
  per clip: i64 frames | i32 speaker
  blob: per clip, frames*pose_dim f32 then frames*aud_dim f32

Poses are stored already normalized + composed to the fbhe layout, so the
hot loop does zero per-batch math on host.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterator, Optional

import numpy as np

_MAGIC = 0x50544C4B44533031

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libprobtalk_loader.so"))

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build_native()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ptlk_loader_open.restype = ctypes.c_void_p
    lib.ptlk_loader_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int,
    ]
    lib.ptlk_loader_num_batches.restype = ctypes.c_int64
    lib.ptlk_loader_num_batches.argtypes = [ctypes.c_void_p]
    lib.ptlk_loader_num_windows.restype = ctypes.c_int64
    lib.ptlk_loader_num_windows.argtypes = [ctypes.c_void_p]
    lib.ptlk_loader_next.restype = ctypes.c_int
    lib.ptlk_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ptlk_loader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def build_native():
    """Compile the loader in-tree (g++, no deps)."""
    subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)], check=True,
                   capture_output=True)


def pack_dataset(path: str, clips, mean: np.ndarray, std: np.ndarray,
                 convert_to_6d: bool = True):
    """Write ClipData list -> packed file (normalized fbhe + audio)."""
    from probtalk_tpu.core import body_parts

    jaw_d = body_parts.each_dim(convert_to_6d)[0]
    idx = body_parts.c_index(convert_to_6d)
    pose_dim = body_parts.full_dim(convert_to_6d)
    aud_dim = clips[0].aud_feat.shape[1]

    with open(path, "wb") as f:
        f.write(struct.pack("<Qqqq", _MAGIC, len(clips), pose_dim, aud_dim))
        for c in clips:
            f.write(struct.pack("<qi", c.poses.shape[0], int(c.speaker)))
        for c in clips:
            full = np.concatenate([c.poses, c.expression], -1)
            full = (full - mean) / std
            fbhe = np.concatenate(
                [full[:, :jaw_d], full[:, : c.poses.shape[1]][:, idx],
                 full[:, c.poses.shape[1]:]], -1).astype(np.float32)
            f.write(np.ascontiguousarray(fbhe).tobytes())
            f.write(np.ascontiguousarray(c.aud_feat.astype(np.float32)).tobytes())


class NativeLoader:
    """Iterate native-assembled batches: dicts of numpy arrays."""

    def __init__(self, path: str, window: int = 180, stride: int = 6,
                 batch: int = 128, seed: int = 0, shuffle: bool = True):
        with open(path, "rb") as f:
            magic, n_clips, pose_dim, aud_dim = struct.unpack("<Qqqq", f.read(32))
        assert magic == _MAGIC, "bad dataset file"
        self.pose_dim, self.aud_dim = pose_dim, aud_dim
        self.window, self.batch = window, batch
        self.path, self.stride, self.seed, self.shuffle = path, stride, seed, shuffle
        self._lib = _load_lib()

    def __iter__(self) -> Iterator[dict]:
        lib = self._lib
        h = lib.ptlk_loader_open(self.path.encode(), self.window, self.stride,
                                 self.batch, self.seed, int(self.shuffle))
        if not h:
            raise RuntimeError(f"native loader failed to open {self.path}")
        try:
            poses = np.empty((self.batch, self.window, self.pose_dim), np.float32)
            aud = np.empty((self.batch, self.window, self.aud_dim), np.float32)
            spk = np.empty((self.batch,), np.int32)
            pp = poses.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            ap = aud.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            sp = spk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            while lib.ptlk_loader_next(h, pp, ap, sp):
                yield {"poses_fbhe": poses.copy(), "aud_feat": aud.copy(),
                       "speaker": spk.copy()}
        finally:
            lib.ptlk_loader_close(h)

    def num_batches(self) -> int:
        lib = self._lib
        h = lib.ptlk_loader_open(self.path.encode(), self.window, self.stride,
                                 self.batch, self.seed, 0)
        n = lib.ptlk_loader_num_batches(h)
        lib.ptlk_loader_close(h)
        return int(n)
