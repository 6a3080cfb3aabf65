#!/bin/bash
# Sharded-prover scaling on the 8-virtual-device CPU mesh (verdict item 3:
# committed sharded_scaling output at a >=2^17 config).
cd /root/repo
set -x

# medium config with full parity check (fast enough to diff transcripts)
timeout 7200 python benchmarks/sharded_scaling.py --n 8 --r 8 --kappa 256 \
  > bench_logs/sharded_med.jsonl 2> bench_logs/sharded_med.err
echo "sharded-med exit: $?" >> bench_logs/sharded.status

# 2^17 witness coefficients (n=128, r=16 -> 131072), rows sweep
timeout 10800 python benchmarks/sharded_scaling.py --n 128 --r 16 \
  --kappa 256 --rows-list 1 8 --skip-parity \
  > bench_logs/sharded_2e17.jsonl 2> bench_logs/sharded_2e17.err
echo "sharded-2e17 exit: $?" >> bench_logs/sharded.status

echo DONE >> bench_logs/sharded.status
