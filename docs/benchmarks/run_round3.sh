#!/bin/bash
# Round-3 CLI benchmark record (VERDICT r2 #8): all 8 designs x 3 ops with
# baselines + peak memory, plus a --standardized variant on the designs
# whose standardized (k,k) expansion is feasible (one_cat at k=100k would
# materialize an 80 GB outer product — infeasible for the reference too).
# Run sequentially: the compile relay serializes, and killed runs still
# accumulate server-side cache — rerun this script until it completes.
set -x
cd /root/repo
OUT=docs/benchmarks
mkdir -p "$OUT"

run() { # design ops csv extra...
  local design="$1" csv="$2"; shift 2
  timeout 3000 python -m tabmat_tpu.bench.main \
    --matrix_name "$design" --include_baseline --bench_memory \
    --output "$OUT/$csv" "$@" 2>&1 | grep -v WARNING | tail -20
}

run dense               r3_dense.csv
run sparse              r3_sparse.csv
run sparse_narrow       r3_sparse_narrow.csv
run sparse_wide         r3_sparse_wide.csv
run one_cat             r3_one_cat.csv
run two_cat             r3_two_cat.csv
run dense_cat           r3_dense_cat.csv
run dense_smallcat      r3_dense_smallcat.csv

run dense               r3_std_dense.csv     --standardized
run sparse              r3_std_sparse.csv    --standardized
run two_cat             r3_std_two_cat.csv   --standardized
run dense_cat           r3_std_dense_cat.csv --standardized

python - <<'EOF'
import csv, glob
rows = []
for f in sorted(glob.glob("docs/benchmarks/r3_*.csv")):
    std = "_std_" in f
    with open(f) as fh:
        for r in csv.DictReader(fh):
            r["standardized"] = std
            rows.append(r)
keys = sorted({k for r in rows for k in r})
with open("docs/benchmarks/round3_cli_full.csv", "w", newline="") as fh:
    w = csv.DictWriter(fh, fieldnames=keys)
    w.writeheader(); w.writerows(rows)
print("merged", len(rows), "rows")
EOF
