#!/bin/bash
# Resumable full-benchmark-tier runner (reference: tests/test_bench.py:61-160
# run on the V100 CI harness). Safe to relaunch after a cutoff: configs with a
# row in results/full_matrix.csv are skipped (tests/test_bench.py::_done_configs).
#
# Usage:  bash benchmarks/run_full_tier.sh          # runs on the TPU (axon)
# Progress: tail -f /tmp/full_tier.log ; rows: wc -l results/full_matrix.csv
cd "$(dirname "$0")/.."
nohup python -m pytest tests/test_bench.py -m full_test -q --no-header \
    > /tmp/full_tier.log 2>&1 &
echo $! > /tmp/full_tier.pid
echo "full tier running: pid $(cat /tmp/full_tier.pid), log /tmp/full_tier.log"
