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

GRID = [(b, bf16) for b in (16, 32, 64, 128) for bf16 in (0, 1)]


def main():
    results = []
    for b, bf16 in GRID:
        env = dict(os.environ)
        env["BENCH_B"] = str(b)
        env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
        if bf16:
            env["BENCH_BF16"] = "1"
            env["BENCH_W2V_BF16"] = "1"
        else:
            env.pop("BENCH_BF16", None)
            env.pop("BENCH_W2V_BF16", None)
        print(f"=== B={b} bf16={bf16}", flush=True)
        p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True, timeout=3600,
                           env=env)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"  FAILED: {p.stderr[-500:]}", flush=True)
            continue
        r = json.loads(line[-1])
        r.update(batch=b, bf16=bool(bf16))
        results.append(r)
        print(f"  {r['value']} {r['unit']}", flush=True)
    results.sort(key=lambda r: -r["value"])
    out = {"grid": results,
           "best": results[0] if results else None}
    json.dump(out, open(os.path.join(REPO, "BENCH_SWEEP.json"), "w"),
              indent=2)
    print(json.dumps(out["best"]))


if __name__ == "__main__":
    main()
