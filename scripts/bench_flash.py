"""Real-TPU bench: Pallas blockwise attention vs XLA attention in the
refiner (RTransformer) at long clip lengths.

VERDICT r2 item 9 deliverable: the kernel must lower on real TPU and beat
the XLA full-matrix attention at T >= 1800 (the reference's PE ceiling,
PTransformer.py:424). Writes FLASH_BENCH.json and prints a table for
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probtalk_tpu.models.rtransformer import RTransformer  # noqa: E402
from probtalk_tpu.utils.profiling import device_sync  # noqa: E402

LENGTHS = [512, 1024, 1792, 3584]
ITERS = 20
B, C, CA = 1, 376, 768


def main():
    print(f"devices: {jax.devices()}", flush=True)
    base_kw = dict(in_dim=C, condi_dim=CA, max_len=4096)
    xla_model = RTransformer(**base_kw)
    flash_model = RTransformer(**base_kw, flash=True)

    x0 = jnp.zeros((B, 64, C), jnp.float32)
    a0 = jnp.zeros((B, 64, CA), jnp.float32)
    m0 = jnp.zeros((B, 64, 1), jnp.float32)
    s0 = jnp.zeros((B,), jnp.int32)
    variables = jax.jit(xla_model.init)(jax.random.key(0), x0, a0, m0, s0)
    print("init done", flush=True)

    apply_xla = jax.jit(lambda v, *a: xla_model.apply(v, *a))
    apply_flash = jax.jit(lambda v, *a: flash_model.apply(v, *a))

    rows = []
    for t in LENGTHS:
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(B, t, C)).astype(np.float32))
        aud = jnp.asarray(np.random.default_rng(1).normal(
            size=(B, t, CA)).astype(np.float32))
        mask = jnp.zeros((B, t, 1), jnp.float32)
        row = {"T": t}
        for name, fn in (("xla", apply_xla), ("flash", apply_flash)):
            try:
                out = fn(variables, x, aud, mask, s0)
                device_sync(out)                        # compile + warm
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    out = fn(variables, x, aud, mask, s0)
                device_sync(out)
                ms = (time.perf_counter() - t0) / ITERS * 1e3
                row[name + "_ms"] = round(ms, 2)
                # numerical agreement at the first length
                if name == "flash" and "xla_ms" in row:
                    ref = apply_xla(variables, x, aud, mask, s0)
                    diff = float(jnp.max(jnp.abs(out - ref)))
                    row["max_abs_diff"] = round(diff, 6)
            except Exception as e:  # OOM at long T counts as a loss for xla
                row[name + "_ms"] = None
                row[name + "_error"] = repr(e)[:200]
        if row.get("xla_ms") and row.get("flash_ms"):
            row["speedup"] = round(row["xla_ms"] / row["flash_ms"], 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    json.dump({"iters": ITERS, "batch": B, "rows": rows},
              open(os.path.join(REPO, "FLASH_BENCH.json"), "w"), indent=2)
    print("wrote FLASH_BENCH.json", flush=True)


if __name__ == "__main__":
    main()
