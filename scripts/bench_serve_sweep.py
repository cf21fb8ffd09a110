"""Serving-engine sweep: lanes x stage dtype on the real chip.

The round-3 serving numbers (PERFORMANCE.md: 6.7k frames/s = 222x
real-time at 8 lanes, raw int16 + f16 out) predate two round-4 findings
from the offline bench sweep (BENCH_SWEEP.json): bf16 transformer stacks
LOSE at small batch but WIN at B>=64, and throughput peaks before the
largest batch (HBM working set + per-batch host cost on the tunnel).
This sweep applies the same grid to the serving engine: lanes x stage
dtype, raw int16 PCM in / f16 out (the production wire config).

Runs scripts/bench_serve.py in subprocesses (one TPU holder at a time),
resumable per arm, writes SERVE_SWEEP.json incrementally.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# lanes = concurrent sessions sharing one bucketed window program; the
# batch dimension of serving. dtype labels match BENCH_SWEEP.json:
#   'default'  = bf16 Wav2Vec2 frontend + f32 stacks (cli/serve.py default)
#   'all_bf16' = bf16 frontend + bf16 predictor/refiner stacks
#   '*_resident' = + device-resident lane state (engine.py resident mode:
#       context tails + RNG keys stay in device slot buffers; the pump
#       fetches a 4-byte probe instead of every lane's (30, 376) tail)
GRID = [(lanes, mode) for lanes in (8, 16, 32, 64)
        for mode in ("default", "all_bf16")] + [(64, "all_bf16_resident")]


def main():
    out_path = os.path.join(REPO, "SERVE_SWEEP.json")
    results = []
    done = set()
    if os.path.exists(out_path):            # resume: skip completed arms
        results = json.load(open(out_path)).get("grid", [])
        done = {(r["lanes"], r["dtype"]) for r in results}
    for lanes, mode in GRID:
        if (lanes, mode) in done:
            print(f"=== lanes={lanes} dtype={mode} (cached)", flush=True)
            continue
        env = dict(os.environ)
        env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
        env.update(SERVE_BENCH_RAW="1", SERVE_BENCH_INT16="1",
                   SERVE_BENCH_F16OUT="1", SERVE_BENCH_LANES=str(lanes))
        env.pop("SERVE_BENCH_W2V_F32", None)   # bf16 frontend in both modes
        env.pop("SERVE_BENCH_BF16", None)
        env.pop("SERVE_BENCH_RESIDENT", None)
        if mode.startswith("all_bf16"):
            env["SERVE_BENCH_BF16"] = "1"
        if mode.endswith("_resident"):
            env["SERVE_BENCH_RESIDENT"] = "1"
        print(f"=== lanes={lanes} dtype={mode}", flush=True)
        try:  # a hung arm must not abort the remaining grid (ADVICE r4)
            p = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "bench_serve.py")],
                capture_output=True, text=True, timeout=3600, env=env)
        except subprocess.TimeoutExpired:
            print(f"  FAILED: timeout after 3600s", flush=True)
            continue
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"  FAILED: {p.stderr[-500:]}", flush=True)
            continue
        r = json.loads(line[-1])
        r["dtype"] = mode                    # sweep label (stage_dtype has
        # second pass, same arm: fixed real-time input rate -> per-stream
        # end-to-end latency p50/p99 (VERDICT r4 item 7 — the SLO column
        # next to the saturation throughput above)
        env_rt = dict(env, SERVE_BENCH_RT="1")
        try:
            p2 = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "bench_serve.py")],
                capture_output=True, text=True, timeout=3600, env=env_rt)
            line2 = [l for l in p2.stdout.splitlines() if l.startswith("{")]
            if line2:
                r2 = json.loads(line2[-1])
                r["latency_ms_p50"] = r2.get("latency_ms_p50")
                r["latency_ms_p99"] = r2.get("latency_ms_p99")
            else:
                print(f"  latency pass FAILED: {p2.stderr[-300:]}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print("  latency pass timed out; throughput kept", flush=True)
        results.append(r)                    # the raw bf16/f32 flag
        print(f"  {r['frames_per_s']} frames/s "
              f"({r['x_realtime_30fps']}x RT) "
              f"lat p50/p99 {r.get('latency_ms_p50')}/"
              f"{r.get('latency_ms_p99')} ms", flush=True)
        _write(out_path, results)            # incremental: survives a kill
    _write(out_path, results)
    print(json.dumps(max(results, key=lambda r: r["frames_per_s"])
                     if results else None))


def _write(path, results):
    ranked = sorted(results, key=lambda r: -r["frames_per_s"])
    out = {"grid": ranked, "best": ranked[0] if ranked else None}
    tmp = path + ".tmp"
    json.dump(out, open(tmp, "w"), indent=2)
    os.replace(tmp, path)


if __name__ == "__main__":
    main()
