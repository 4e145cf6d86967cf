"""Render the per-cell vs-baseline markdown table from the r5 CSVs.

Usage: python docs/benchmarks/mk_table.py  → prints the markdown block
that docs/benchmarks/README.md embeds under "Round 5 — per-cell record".
"""

import csv
import glob
import os

HERE = os.path.dirname(__file__)


def main():
    designs = {}
    for f in sorted(glob.glob(os.path.join(HERE, "r5_*.csv"))):
        name = os.path.basename(f)[3:-4]
        dev, base, hbm = {}, {}, {}
        with open(f) as fh:
            for r in csv.DictReader(fh):
                op = r["operation"]
                if r["library"] == "tabmat_tpu":
                    dev[op] = float(r["time_s"])
                    if r.get("hbm_total_bytes"):
                        hbm[op] = int(r["hbm_total_bytes"])
                else:
                    base[op] = float(r["time_s"])
        designs[name] = (dev, base, hbm)

    ops = ["matvec", "transpose-matvec", "sandwich"]
    print("| design | " + " | ".join(f"{o} (ms / vs CPU)" for o in ops)
          + " | peak HBM |")
    print("|---|" + "---|" * (len(ops) + 1))
    losses = []
    for name, (dev, base, hbm) in designs.items():
        cells = []
        for op in ops:
            if op not in dev:
                cells.append("—")
                continue
            t = dev[op]
            if op in base and t > 0:
                r = base[op] / t
                mark = " **(loss)**" if r < 1 else ""
                if r < 1:
                    losses.append((name, op, t, r))
                cells.append(f"{t*1e3:.2f} / {r:.2f}×{mark}")
            else:
                cells.append(f"{t*1e3:.2f} / –")
        peak = max(hbm.values()) if hbm else 0
        cells.append(f"{peak/2**30:.2f} GB" if peak else "—")
        print(f"| {name} | " + " | ".join(cells) + " |")
    print()
    if losses:
        print("Sub-1× cells (documented floors or open items):")
        for name, op, t, r in sorted(losses, key=lambda x: x[3]):
            print(f"- {name} {op}: {t*1e3:.2f} ms ({r:.2f}×)")


if __name__ == "__main__":
    main()
