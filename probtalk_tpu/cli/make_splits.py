"""Dataset split generator.

Capability of the reference's ``data_utils/dataset_preprocess.py``: walk a
SHOW-layout data root and emit train/val/test clip lists as .npy arrays
(the format of the pinned ``data_utils/split/*_split.npy`` fixtures).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_splits(data_root: str, speakers, val_frac: float = 0.05,
                test_frac: float = 0.1, seed: int = 0):
    rng = np.random.default_rng(seed)
    entries = []
    for sp in speakers:
        sp_dir = os.path.join(data_root, sp)
        if not os.path.isdir(sp_dir):
            continue
        for clip in sorted(os.listdir(sp_dir)):
            if os.path.exists(os.path.join(sp_dir, clip, clip + ".pkl")):
                entries.append(f"{sp}/{clip}")
    entries = np.asarray(entries)
    rng.shuffle(entries)
    n = len(entries)
    n_val = max(int(n * val_frac), 1) if n > 2 else 0
    n_test = max(int(n * test_frac), 1) if n > 2 else 0
    return {
        "train": entries[n_val + n_test:],
        "val": entries[:n_val],
        "test": entries[n_val: n_val + n_test],
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--speakers", nargs="+",
                   default=["oliver", "chemistry", "seth", "conan"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    splits = make_splits(args.data_root, args.speakers, seed=args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    for name, arr in splits.items():
        path = os.path.join(args.out_dir, f"{name}_split.npy")
        np.save(path, arr)
        print(f"{name}: {len(arr)} clips -> {path}")


if __name__ == "__main__":
    main()
