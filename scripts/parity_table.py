"""Render PARITY_FGD.json as the PARITY.md markdown table (all embedders)."""
import json
import sys

d = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "PARITY_FGD.json"))
rows = [(k, v) for k, v in d.items() if k != "config"]
print("| run | fgd_bh | fgd_fe | fgd_fbhe | diversity | gen_s |")
print("|---|---|---|---|---|---|")
for k, v in rows:
    print(f"| {k} | {v['fgd_bh']:.3f} | {v['fgd_fe']:.3f} | "
          f"{v['fgd_fbhe']:.3f} | {v['diversity']:.4f} | "
          f"{v['gen_seconds']:.2f} |")
