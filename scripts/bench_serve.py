"""Serving-engine bench: concurrent streaming sessions on real stages.

Steady-state throughput with a full bucket, OUTPUTS MATERIALIZED in the
timed loop (every session polls each round — the device->host transfer is
part of serving, and on this tunnel-attached backend it dominates).

Modes:
  feature (default)      sessions feed 768-d motion-fps features
  SERVE_BENCH_RAW=1      sessions feed raw 16 kHz PCM; the engine runs the
                         full Wav2Vec2-base (50->30 fps) frontend on device
                         inside the batched window program
  SERVE_BENCH_INT16=1    (raw mode) int16 PCM wire/upload
  SERVE_BENCH_F16OUT=1   float16 device->host output transfer
  SERVE_BENCH_LANES=n    bucket width (default 4)
  SERVE_BENCH_BF16=1     bf16 predictor/refiner stacks
  SERVE_BENCH_W2V_F32=1  (raw mode) f32 acoustic frontend (default bf16,
                         matching the cli/serve.py --pcm production default)
  SERVE_BENCH_RESIDENT=1 device-resident lane state: context tails + RNG
                         keys stay in device slot buffers; the pump fetches
                         a 4-byte probe per batch instead of every lane's
                         (30, 376) tail (engine.py resident mode)
  SERVE_BENCH_ASYNC=1    production-shaped concurrency: one drain thread
                         per lane polls outputs (D2H fetch outside the
                         engine lock) while the main thread feeds + pumps
                         — output download of batch N overlaps batch N+1's
                         audio upload, exactly like the HTTP server's pump
                         thread + per-client handler threads. The default
                         lockstep loop serializes the two transfer legs and
                         understates the engine.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serve.py
Round-3 numbers recorded in PERFORMANCE.md come from this drive on one
TPU v5e chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    from probtalk_tpu.audio.wav2vec2 import Wav2Vec2Encoder
    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.serve.engine import ServingEngine
    from probtalk_tpu.train.stages import PredictorStage, RefinerStage
    from probtalk_tpu.train.state import adamw, create_train_state

    cm, ca, t, sr = 376, 768, 180, 16000
    lanes = int(os.environ.get("SERVE_BENCH_LANES", 4))
    raw = bool(os.environ.get("SERVE_BENCH_RAW"))
    int16 = bool(os.environ.get("SERVE_BENCH_INT16"))
    f16out = bool(os.environ.get("SERVE_BENCH_F16OUT"))
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
    kw = {}
    if raw:
        # match the production serving default (cli/serve.py --pcm):
        # bf16 frontend compute, SERVE_BENCH_W2V_F32=1 restores f32
        w2v = Wav2Vec2Encoder(
            dtype=None if os.environ.get("SERVE_BENCH_W2V_F32")
            else jnp.bfloat16)
        w2v_vars = jax.jit(lambda r, x: w2v.init(r, x, n_frames=t))(
            jax.random.key(4), jnp.zeros((1, sr), jnp.float32))
        kw.update(frontend=(w2v, w2v_vars), sr=sr, fps=30,
                  wav_dtype=np.int16 if int16 else np.float32)
    if f16out:
        kw["emit_dtype"] = jnp.float16
    resident = bool(os.environ.get("SERVE_BENCH_RESIDENT"))
    if resident:
        kw.update(resident=True, resident_slots=lanes)
    print(f"init {time.time()-t0:.0f}s; devices {jax.devices()}")

    eng = ServingEngine(vq, vq_vars, pred, pred_state, ref, ref_state,
                        window=t, overlap=30, max_batch=lanes, **kw)
    step = eng.step                                   # new frames per window
    rng = np.random.default_rng(0)

    def u(frames: int) -> int:                        # frames -> input units
        return frames * sr // 30 if raw else frames

    # RT mode iterates 32 windows (vs 16) — size the input stream for it.
    # Resident mode warms TWO windows: first and continuation windows are
    # separate compiled programs (step-only upload), and the cont compile
    # must land before the timed loop.
    n_warm = 2 if resident else 1
    feats_len = u(t + (n_warm - 1 +
                       (32 if os.environ.get("SERVE_BENCH_RT") else 16))
                  * step)
    if raw:
        wav = (0.1 * rng.normal(size=(feats_len,))).astype(np.float32)
        feats = (np.clip(wav * 32768, -32768, 32767).astype(np.int16)
                 if int16 else wav)
    else:
        feats = 0.1 * rng.normal(size=(feats_len, ca)).astype(np.float32)

    sids = [eng.create_session(speaker=i, seed=i) for i in range(lanes)]
    for sid in sids:                                  # first full window
        eng.feed(sid, feats[:u(t)], pump=False)
    eng.pump_all()                                    # warm/compile
    for sid in sids:
        eng.poll(sid)
    for k in range(1, n_warm):                        # warm cont program
        lo, hi = u(t + (k - 1) * step), u(t + k * step)
        for sid in sids:
            eng.feed(sid, feats[lo:hi], pump=False)
        eng.pump_all()
        for sid in sids:
            eng.poll(sid)
    # SERVE_BENCH_RT=1: fixed real-time input rate (each lane produces
    # audio at 30 fps wall clock) and per-stream end-to-end latency —
    # feed-complete -> frames materialized on host — p50/p99 (VERDICT r4
    # item 7: the SLO quantity, vs the saturation throughput below).
    rt = bool(os.environ.get("SERVE_BENCH_RT"))
    async_mode = bool(os.environ.get("SERVE_BENCH_ASYNC")) and not rt
    n_iter, frames = (32 if rt else 16), 0
    period = step / 30.0
    lat_ms = []
    if async_mode:
        import threading

        quota = n_iter * step
        counts = {sid: 0 for sid in sids}

        def drain(sid):
            while counts[sid] < quota:
                out = eng.poll(sid, timeout=2.0)      # fetch outside lock
                counts[sid] += out.shape[0]

        ths = [threading.Thread(target=drain, args=(sid,), daemon=True)
               for sid in sids]
        t0 = time.time()
        for th in ths:
            th.start()
        for it in range(n_iter):
            lo = u(t + (n_warm - 1 + it) * step)
            hi = u(t + (n_warm + it) * step)
            for sid in sids:
                eng.feed(sid, feats[lo:hi], pump=False)
            eng.pump_all()
        for th in ths:
            th.join()
        frames = lanes * quota
        dt = time.time() - t0
    else:
        t0 = time.time()
        for it in range(n_iter):
            if rt:
                target = t0 + it * period
                now = time.time()
                if now < target:
                    time.sleep(target - now)
            lo = u(t + (n_warm - 1 + it) * step)
            hi = u(t + (n_warm + it) * step)
            t_fed = {}
            for sid in sids:
                eng.feed(sid, feats[lo:hi], pump=False)
                t_fed[sid] = time.time()
            frames += lanes * step
            eng.pump_all()
            for sid in sids:                          # materialize outputs
                out = eng.poll(sid)
                assert out.shape[0] == step, out.shape
                lat_ms.append((time.time() - t_fed[sid]) * 1e3)
        dt = time.time() - t0
    mode = ("raw-int16" if raw and int16 else "raw-f32" if raw else "feature")
    result = {
        "mode": mode, "lanes": lanes, "resident": resident,
        "async_drain": async_mode,
        "stage_dtype": "bf16" if sdt else "f32",
        "emit": "f16" if f16out else "f32",
        "frames_per_s": round(frames / dt, 1),
        "x_realtime_30fps": round(frames / dt / 30, 1),
        **eng.latency_stats(),
    }
    if rt:
        v = np.asarray(lat_ms)
        result.update(rt_paced=True,
                      latency_ms_p50=round(float(np.percentile(v, 50)), 1),
                      latency_ms_p99=round(float(np.percentile(v, 99)), 1))
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
