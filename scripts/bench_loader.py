"""Micro-bench: C++ native batch producer vs python WindowedDataset.

VERDICT r2 item 5 evidence: on the 1-core host, python window gathering
dominates a ~10 ms device step; the native double-buffered producer should
cut per-batch host time. Prints one JSON line; numbers go to
PERFORMANCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.environ.get("PROBTALK_CACHE", "/tmp/ptlk_cache_r2")
BS, WINDOW, EPOCHS = 8, 176, 20


def main():
    from probtalk_tpu.cli.data_build import build_cache, load_cached_clips
    from probtalk_tpu.data.dataset import WindowedDataset
    from probtalk_tpu.data.native_loader import NativeLoader, pack_dataset

    build_cache("/root/reference/demo_audio", CACHE,
                ["oliver", "chemistry", "seth", "conan"],
                "/root/reference/data_utils/hand_component.json",
                audio_feat="mfcc")
    clips, mean, std = load_cached_clips(CACHE)
    ds = WindowedDataset(clips, window=WINDOW, stride=6, mean=mean, std=std)

    packed = "/tmp/bench_loader.ptlk"
    if not os.path.exists(packed):
        pack_dataset(packed, clips, mean, std)

    # python producer
    n_py = 0
    t0 = time.perf_counter()
    for e in range(EPOCHS):
        for b in ds.fbhe_batches(BS, seed=e, drop_remainder=True):
            n_py += 1
            assert b["poses_fbhe"].shape == (BS, WINDOW, 376)
    t_py = time.perf_counter() - t0

    # native producer
    n_nat = 0
    t0 = time.perf_counter()
    for e in range(EPOCHS):
        for b in NativeLoader(packed, window=WINDOW, stride=6, batch=BS,
                              seed=e):
            n_nat += 1
            assert b["poses_fbhe"].shape == (BS, WINDOW, 376)
    t_nat = time.perf_counter() - t0

    out = {
        "batches_python": n_py, "batches_native": n_nat,
        "ms_per_batch_python": round(t_py / n_py * 1e3, 3),
        "ms_per_batch_native": round(t_nat / n_nat * 1e3, 3),
        "speedup": round((t_py / n_py) / (t_nat / n_nat), 2),
    }
    print(json.dumps(out), flush=True)
    json.dump(out, open(os.path.join(REPO, "LOADER_BENCH.json"), "w"),
              indent=2)


if __name__ == "__main__":
    main()
