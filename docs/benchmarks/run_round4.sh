#!/bin/bash
# Round-4 CLI benchmark record: all 8 reference designs x 3 ops with
# baselines + peak memory, plus --standardized variants where the (k,k)
# expansion is feasible (one_cat at k=100k would materialize an 80 GB
# outer product — infeasible for the reference too).
#
# Measured on HEAD with the round-4 kernels (v4 transposed-d sandwich,
# cache-shared tmv, mirror-first sparse matvec).  The chained-marginal
# protocol (tabmat_tpu/bench/main.py:_marginal_device) feeds each chain
# link distinct inputs and doubles the chain until the K2-K1 difference
# clears 25 ms of real device work, so relay memoization / XLA CSE
# cannot produce impossible cells (the round-3 5e-05 s artifacts).
#
# Run sequentially: the compile relay serializes, and killed runs still
# accumulate server-side cache — rerun this script until it completes.
set -x
cd /root/repo
OUT=docs/benchmarks
mkdir -p "$OUT"

run() { # design csv extra...
  local design="$1" csv="$2"; shift 2
  timeout 3000 python -m tabmat_tpu.bench.main \
    --matrix_name "$design" --include_baseline --bench_memory \
    --output "$OUT/$csv" "$@" 2>&1 | grep -v WARNING | tail -8
}

run dense               r4_dense.csv
run sparse              r4_sparse.csv
run sparse_narrow       r4_sparse_narrow.csv
run sparse_wide         r4_sparse_wide.csv
run one_cat             r4_one_cat.csv
run two_cat             r4_two_cat.csv
run dense_cat           r4_dense_cat.csv
run dense_smallcat      r4_dense_smallcat.csv

run dense               r4_std_dense.csv     --standardized
run sparse              r4_std_sparse.csv    --standardized
run two_cat             r4_std_two_cat.csv   --standardized
run dense_cat           r4_std_dense_cat.csv --standardized

python - <<'EOF'
import csv, glob
rows = []
for f in sorted(glob.glob("docs/benchmarks/r4_*.csv")):
    std = "_std_" in f
    with open(f) as fh:
        for r in csv.DictReader(fh):
            r["standardized"] = std
            rows.append(r)
keys = sorted({k for r in rows for k in r})
with open("docs/benchmarks/round4_cli_full.csv", "w", newline="") as fh:
    w = csv.DictWriter(fh, fieldnames=keys)
    w.writeheader(); w.writerows(rows)
print("merged", len(rows), "rows")
EOF
