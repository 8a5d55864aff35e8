#!/bin/bash
# Zoo-wide 100k-cell scale lane (VERDICT r4 item 6): one representative per
# remaining family, run serially on the single chip. Logs to
# /tmp/scale_<model>.log; each entry prints first-fit + steady-state lines
# consumed by the BENCH_MATRIX.md scale section.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
for m in scdeepcluster deepimpute stagate spatialdecon; do
    echo "=== $m $(date +%H:%M:%S) ==="
    timeout 3600 python benchmarks/scale_proof.py --model "$m" \
        --cells 100000 --genes 2000 2>&1 | grep -v "^\[INFO\|^WARNING"
done
