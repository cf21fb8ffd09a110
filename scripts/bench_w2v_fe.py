"""Wav2Vec2 frontend micro-bench: XLA-conv vs im2col/matmul feature
extractor, f32 vs bf16, on the real TPU.

Motivation (PERFORMANCE.md round-2): the fused serving program spends
16.3 ms of 23 ms in the Wav2Vec2 stage at B=16/T=180, and bf16 compute
recovered only +2.9% end-to-end — evidence that the 7-layer strided conv
stack is not reaching the MXU under XLA's 1-D conv lowering. The
``FeatureExtractor(impl='matmul')`` path (audio/wav2vec2.py) reformulates
every VALID strided conv as an im2col matmul with an identical param tree.

Prints one JSON line with ms/call for {fe,full} x {conv,matmul} x
{f32,bf16}; value-fetch barrier timing (bare block_until_ready returns at
enqueue on this backend).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probtalk_tpu.audio.wav2vec2 import FeatureExtractor, Wav2Vec2Encoder
from probtalk_tpu.eval.harness import device_sync

B, S, NF = 16, 96000, 180   # the bench.py serving workload (6 s @ 16 kHz)
ITERS = 30


def timeit(fn, *args):
    device_sync(fn(*args))            # compile + warm
    device_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(B, S)),
                      jnp.float32) * 0.1
    res = {}

    fe_ref = FeatureExtractor(impl="conv")
    fe_vars = jax.jit(fe_ref.init)(jax.random.key(0), wav[:1])
    for impl, dt, tag in (("conv", None, "f32"), ("conv", jnp.bfloat16, "bf16"),
                          ("matmul", None, "f32"),
                          ("matmul", jnp.bfloat16, "bf16"),
                          ("fold", jnp.bfloat16, "bf16"),
                          ("int8", None, "int8")):
        fe = FeatureExtractor(impl=impl, dtype=dt)
        f = jax.jit(lambda v, x, fe=fe: fe.apply(v, x))
        res[f"fe_{impl}_{tag}"] = round(timeit(f, fe_vars, wav), 3)
        print(f"fe {impl} {tag}: {res[f'fe_{impl}_{tag}']} ms", flush=True)

    enc_ref = Wav2Vec2Encoder(fe_impl="conv")
    enc_vars = jax.jit(lambda r, x: enc_ref.init(r, x, n_frames=NF))(
        jax.random.key(0), wav[:1])
    for impl, dt, fe_dt, tag in (
            ("conv", None, None, "f32"),
            ("conv", jnp.bfloat16, None, "bf16"),
            ("matmul", None, None, "f32"),
            ("fold", None, jnp.bfloat16, "fe-bf16"),
            ("fold", jnp.bfloat16, None, "bf16"),
            ("int8", None, None, "fe-int8"),
            ("int8", jnp.bfloat16, None, "bf16+fe-int8")):
        enc = Wav2Vec2Encoder(fe_impl=impl, dtype=dt, fe_dtype=fe_dt)
        f = jax.jit(lambda v, x, enc=enc: enc.apply(v, x, n_frames=NF))
        res[f"full_{impl}_{tag}"] = round(timeit(f, enc_vars, wav), 3)
        print(f"full {impl} {tag}: {res[f'full_{impl}_{tag}']} ms",
              flush=True)

    # numerical agreement on device vs the f32 conv reference
    a = jax.jit(lambda v, x: Wav2Vec2Encoder(fe_impl="conv").apply(
        v, x, n_frames=NF))(enc_vars, wav)
    for impl in ("matmul", "fold", "int8"):
        b = jax.jit(lambda v, x, impl=impl: Wav2Vec2Encoder(fe_impl=impl).apply(
            v, x, n_frames=NF))(enc_vars, wav)
        res[f"max_abs_diff_{impl}"] = float(jnp.abs(a - b).max())
    res["out_scale"] = float(jnp.abs(a).mean())
    print(json.dumps(res), flush=True)
    with open("/root/repo/W2V_FE_BENCH.json", "w") as f:
        json.dump({"B": B, "S": S, "n_frames": NF, "iters": ITERS, **res}, f,
                  indent=1)


if __name__ == "__main__":
    main()
