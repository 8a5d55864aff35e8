# Committed CI lanes — the pinned entry points the round driver and any CI
# runner use, so results/parity.csv and the bench matrix cannot silently rot.

PY := PYTHONPATH=/root/repo:$(PYTHONPATH) python

.PHONY: test light full parity bench bench-matrix verify

test:            ## unit + math-parity tiers on the virtual 8-device CPU mesh
	./run_tests.sh tests/ -q

light:           ## every example script end to end (2-epoch smoke budgets)
	./run_tests.sh tests/test_bench.py -m light_test -q

full:            ## full benchmark budgets
	./run_tests.sh tests/test_bench.py -m full_test -q

parity:          ## head-to-head vs the reference implementation -> results/parity.csv
	$(PY) benchmarks/parity.py

bench:           ## the driver's single-number benchmark (one JSON line)
	$(PY) bench.py

bench-matrix:    ## zoo-wide TPU matrix -> results/bench_matrix.csv + BENCH_MATRIX.md
	$(PY) benchmarks/matrix.py

verify: test light parity
