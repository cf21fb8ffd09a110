"""Render PARITY_FGD.json as the PARITY.md markdown table.

Usage: python scripts/render_parity_table.py [path/to/PARITY_FGD.json]
Sorted: torch rows first, then jax arms alphabetically; all three
embedders + diversity + generation seconds per row.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "PARITY_FGD.json")
    d = json.load(open(path))
    rows = {k: v for k, v in d.items() if k != "config"}
    order = sorted(rows, key=lambda k: (not k.startswith("torch"), k))
    print("| run | fgd_bh | fgd_fe | fgd_fbhe | diversity | gen s |")
    print("|---|---|---|---|---|---|")
    for k in order:
        r = rows[k]
        print(f"| {k} | {r['fgd_bh']:.3f} | {r['fgd_fe']:.3f} "
              f"| {r['fgd_fbhe']:.3f} | {r['diversity']:.4f} "
              f"| {r['gen_seconds']:.2f} |")


if __name__ == "__main__":
    main()
