# tabmat-tpu development targets

.PHONY: test native bench bench-cli clean

native:
	sh tabmat_tpu/_native/build.sh

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

bench-cli:
	python -m tabmat_tpu.bench.main --matrix_name dense,sparse --scale 0.001 \
		--n_iterations 5 --include_baseline --output benchmarks.csv
	python -m tabmat_tpu.bench.visualize benchmarks.csv

clean:
	rm -f tabmat_tpu/_native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
