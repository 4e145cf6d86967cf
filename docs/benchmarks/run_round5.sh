#!/bin/bash
# Round-5 CLI benchmark record: all 8 reference designs x 3 ops with
# baselines + peak host memory + peak HBM (hbm_cache_bytes /
# hbm_total_bytes columns, round-5 addition), plus --standardized
# variants where the (k,k) expansion is feasible (one_cat at k=100k
# would materialize an 80 GB outer product — infeasible for the
# reference too).
#
# Measured on HEAD with the round-5 kernels.  The chained-marginal
# protocol (tabmat_tpu/bench/main.py:_marginal_device) feeds each chain
# link distinct inputs and doubles the chain until the K2-K1 difference
# clears 25 ms of real device work, so relay memoization / XLA CSE
# cannot produce impossible cells (the round-3 5e-05 s artifacts).
#
# Run sequentially: the compile relay serializes, and killed runs still
# accumulate server-side compile cache — rerun this script until it
# completes (each design is skipped if its CSV already exists, so a
# crashed run resumes where it stopped; delete a CSV to force a redo).
set -x
cd /root/repo
OUT=docs/benchmarks
mkdir -p "$OUT"

run() { # design csv extra...
  local design="$1" csv="$2"; shift 2
  if [ -s "$OUT/$csv" ]; then echo "skip $csv (exists)"; return 0; fi
  timeout 3000 python -m tabmat_tpu.bench.main \
    --matrix_name "$design" --include_baseline --bench_memory \
    --output "$OUT/$csv.tmp" "$@" 2>&1 | grep -v WARNING | tail -8
  if [ -s "$OUT/$csv.tmp" ]; then mv "$OUT/$csv.tmp" "$OUT/$csv"; fi
}

run dense               r5_dense.csv
run sparse              r5_sparse.csv
run sparse_narrow       r5_sparse_narrow.csv
run sparse_wide         r5_sparse_wide.csv
run one_cat             r5_one_cat.csv
run two_cat             r5_two_cat.csv
run dense_cat           r5_dense_cat.csv
run dense_smallcat      r5_dense_smallcat.csv

run dense               r5_std_dense.csv     --standardized
run sparse              r5_std_sparse.csv    --standardized
run two_cat             r5_std_two_cat.csv   --standardized
run dense_cat           r5_std_dense_cat.csv --standardized

python - <<'EOF'
import csv, glob
rows = []
for f in sorted(glob.glob("docs/benchmarks/r5_*.csv")):
    std = "_std_" in f
    with open(f) as fh:
        for r in csv.DictReader(fh):
            r["standardized"] = std
            rows.append(r)
keys = sorted({k for r in rows for k in r})
with open("docs/benchmarks/round5_cli_full.csv", "w", newline="") as fh:
    w = csv.DictWriter(fh, fieldnames=keys)
    w.writeheader(); w.writerows(rows)
print("merged", len(rows), "rows")
EOF
echo "ROUND5_CLI_DONE"
