"""Serving-throughput sweep: batch size x compute dtype on the real chip.

Runs bench.py (the TRUE audio->motion program) across BENCH_B and
BENCH_BF16 settings in subprocesses (one TPU holder at a time), collects
the one-line JSON each run prints, and writes BENCH_SWEEP.json. The best
honest configuration informs bench.py's default.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# dtype modes (fixed label->config mapping, independent of bench.py's
# defaults so recorded arms stay comparable across rounds):
#   'default'  = bf16 Wav2Vec2 frontend + f32 stacks
#   'f32'      = everything f32
#   'all_bf16' = bf16 frontend + bf16 stacks (bench.py's default since
#                round 4 — the sweep's best arm at B=64)
GRID = [(b, mode) for b in (16, 32, 64, 128)
        for mode in ("default", "f32", "all_bf16")]
# round-5 arms (VERDICT r4 item 5): the B=64..128 falloff interior, and
# the int8-quantized frozen-FE serving arms at the best batch points
GRID += [(80, "all_bf16"), (96, "all_bf16"),
         (64, "int8"), (96, "int8"), (64, "int8mm"), (96, "int8mm")]


def main():
    out_path = os.path.join(REPO, "BENCH_SWEEP.json")
    results = []
    done = set()
    if os.path.exists(out_path):            # resume: skip completed arms
        results = json.load(open(out_path)).get("grid", [])
        done = {(r["batch"], r["dtype"]) for r in results}
    for b, mode in GRID:
        if (b, mode) in done:
            print(f"=== B={b} dtype={mode} (cached)", flush=True)
            continue
        env = dict(os.environ)
        env["BENCH_B"] = str(b)
        env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
        env.pop("BENCH_W2V_F32", None)
        env.pop("BENCH_FE_INT8", None)
        env["BENCH_BF16"] = "0"             # explicit: labels, not defaults
        if mode == "f32":
            env["BENCH_W2V_F32"] = "1"
        elif mode == "all_bf16":
            env["BENCH_BF16"] = "1"
        elif mode in ("int8", "int8mm"):
            # int8 FE convs under the otherwise-best bf16 config
            env["BENCH_BF16"] = "1"
            env["BENCH_FE_INT8"] = mode
        print(f"=== B={b} dtype={mode}", flush=True)
        try:  # a hung arm must not abort the remaining grid (ADVICE r4)
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, timeout=3600, env=env)
        except subprocess.TimeoutExpired:
            print(f"  FAILED: timeout after 3600s", flush=True)
            continue
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"  FAILED: {p.stderr[-500:]}", flush=True)
            continue
        r = json.loads(line[-1])
        r.update(batch=b, dtype=mode)
        results.append(r)
        print(f"  {r['value']} {r['unit']}", flush=True)
        _write(out_path, results)            # incremental: survives a kill
    _write(out_path, results)
    print(json.dumps(max(results, key=lambda r: r["value"])
                     if results else None))


def _write(path, results):
    ranked = sorted(results, key=lambda r: -r["value"])
    out = {"grid": ranked, "best": ranked[0] if ranked else None}
    tmp = path + ".tmp"
    json.dump(out, open(tmp, "w"), indent=2)
    os.replace(tmp, path)


if __name__ == "__main__":
    main()
