"""Benchmark: end-to-end audio->motion throughput of the full ProbTalk
pipeline (MaskGit predictor T=8 + PQ decode + refiner) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no absolute numbers (BASELINE.md); its measured
quantity is `fps = total_frame / total_time` (scripts/test_holisticbody.py:369).
The north star is >50x real-time per chip at 30 fps motion = 1500 frames/s;
vs_baseline is reported against that bar.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.train.stages import (
        PredictorStage, RefinerStage, make_predictor_infer_fn,
        make_refiner_infer_fn,
    )
    from probtalk_tpu.train.state import create_train_state, adamw

    # B=16 = the reference eval harness's diversity-sample batch
    # (scripts/test_holisticbody.py B=16); per-sample latency is ~the same
    # as B=1 (dispatch-bound, see PERFORMANCE.md)
    cm, ca, t, b = 376, 768, 180, 16

    # real-size stages (randomly initialized — throughput only)
    vq = VQVAE(in_dim=cm, embedding_dim=512, num_codes=128, groups=4,
               hiddens=1024, res_layers=2)
    x = jnp.zeros((b, t, cm), jnp.float32)
    vq_vars = vq.init({"params": jax.random.key(0), "quant": jax.random.key(1)},
                      x, train=True)

    pred_stage = PredictorStage(mot_dim=cm, num_code=128, groups=4,
                                dec_layers=6, aud_dim=ca, maskgit_T=8)
    mask = jnp.zeros((b, t, 1), jnp.float32)

    def down3(n):  # three stride-2 convs (k4, pad 1): n -> (n-2)//2 + 1
        for _ in range(3):
            n = (n - 2) // 2 + 1
        return n

    codes0 = jnp.zeros((b, down3(t), 4), jnp.int32)
    spk = jnp.zeros((b,), jnp.int32)
    aud = jnp.zeros((b, t, ca), jnp.float32)
    pred_state = create_train_state(
        pred_stage, (x, codes0, mask, spk, aud), jax.random.key(2), adamw(1e-4),
        init_kwargs={"train": False},
    )

    ref_stage = RefinerStage(in_dim=cm, aud_dim=ca, layers=6)
    ref_state = create_train_state(ref_stage, (x, aud, mask, spk),
                                   jax.random.key(3), adamw(1e-4),
                                   init_kwargs={"train": False})

    predict = make_predictor_infer_fn(pred_stage, vq, vq_vars)
    refine = make_refiner_infer_fn(ref_stage)

    def full(key, aud):
        prelim, codes = predict(pred_state, key, x, mask, spk, aud)
        return refine(ref_state, prelim, aud, mask, spk)

    rng = np.random.default_rng(0)
    aud_np = jnp.asarray(rng.normal(size=(b, t, ca)).astype(np.float32))

    # warmup / compile
    out = full(jax.random.key(0), aud_np)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = full(jax.random.key(i), aud_np)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames_per_sec = b * t * iters / dt
    north_star = 1500.0  # 50x real-time at 30 fps
    print(json.dumps({
        "metric": "audio_to_motion_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / north_star, 3),
    }))


if __name__ == "__main__":
    main()
