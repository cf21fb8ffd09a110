"""Serving-engine bench: concurrent streaming sessions on real stages.

The numbers recorded in PERFORMANCE.md (round 3) came from this drive on
one TPU v5e chip: 3 concurrent sessions end-to-end, cross-bucket bf16
agreement 5.3e-3, steady-state 3,169 new frames/s with a full 4-lane
bucket (105x real-time at 30 fps).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serve.py
Knobs: SERVE_BENCH_LANES (default 4), SERVE_BENCH_BF16=1 for bf16 stacks.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.serve.engine import ServingEngine
    from probtalk_tpu.train.stages import PredictorStage, RefinerStage
    from probtalk_tpu.train.state import adamw, create_train_state

    cm, ca, t = 376, 768, 180
    lanes = int(os.environ.get("SERVE_BENCH_LANES", 4))
    sdt = jnp.bfloat16 if os.environ.get("SERVE_BENCH_BF16") else None

    t0 = time.time()
    vq = VQVAE(in_dim=cm, embedding_dim=512, num_codes=128, groups=4,
               hiddens=1024, res_layers=2)
    x = jnp.zeros((1, t, cm), jnp.float32)
    vq_vars = jax.jit(lambda r, x: vq.init(r, x, train=True))(
        {"params": jax.random.key(0), "quant": jax.random.key(1)}, x)
    pred = PredictorStage(mot_dim=cm, num_code=128, groups=4, dec_layers=6,
                          aud_dim=ca, maskgit_T=8, dtype=sdt)
    mask = jnp.zeros((1, t, 1), jnp.float32)
    codes0 = jnp.zeros((1, 23, 4), jnp.int32)
    spk = jnp.zeros((1,), jnp.int32)
    aud = jnp.zeros((1, t, ca), jnp.float32)
    pred_state = create_train_state(pred, (x, codes0, mask, spk, aud),
                                    jax.random.key(2), adamw(1e-4),
                                    init_kwargs={"train": False})
    ref = RefinerStage(in_dim=cm, aud_dim=ca, layers=6, dtype=sdt)
    ref_state = create_train_state(ref, (x, aud, mask, spk),
                                   jax.random.key(3), adamw(1e-4),
                                   init_kwargs={"train": False})
    print(f"init {time.time()-t0:.0f}s; devices {jax.devices()}")

    eng = ServingEngine(vq, vq_vars, pred, pred_state, ref, ref_state,
                        window=t, overlap=30, max_batch=lanes)
    step = eng.step                                   # new frames per window
    rng = np.random.default_rng(0)
    feats = 0.1 * rng.normal(size=(t + 20 * step, ca)).astype(np.float32)

    sids = [eng.create_session(speaker=i, seed=i) for i in range(lanes)]
    for sid in sids:                                  # first full window
        eng.feed(sid, feats[:t], pump=False)
    eng.pump_all()                                    # warm/compile
    n_iter, frames = 10, 0
    t0 = time.time()
    for it in range(n_iter):
        lo = t + it * step
        for sid in sids:
            eng.feed(sid, feats[lo:lo + step], pump=False)
        frames += lanes * step
        eng.pump_all()                                # engine fetch = barrier
    dt = time.time() - t0
    print(f"lanes={lanes} dtype={'bf16' if sdt else 'f32'}: "
          f"{frames/dt:.0f} new frames/s "
          f"({frames/dt/30:.0f}x real-time at 30 fps); "
          f"latency {eng.latency_stats()}")


if __name__ == "__main__":
    main()
