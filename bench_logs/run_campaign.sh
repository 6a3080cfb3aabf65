#!/bin/bash
# Round-4 TPU benchmark campaign — sequential (one chip, one tunnel).
# Each step logs to bench_logs/; driver-tracked results land in PERF.md.
cd /root/repo
set -x

# 1. headline metric with the fixed fetch-based timing + roofline guard
timeout 3600 python bench.py --skip-e2e \
  > bench_logs/headline.json 2> bench_logs/headline.err
echo "headline exit: $?" >> bench_logs/campaign.status

# 2. kernel micro-benches (u1/cd rows for PERF.md — verdict item 7)
timeout 5400 python benchmarks/ajtai_bench.py \
  > bench_logs/ajtai.log 2>&1
echo "ajtai exit: $?" >> bench_logs/campaign.status
timeout 5400 python benchmarks/cd_bench.py \
  > bench_logs/cd.log 2>&1
echo "cd exit: $?" >> bench_logs/campaign.status

# 3. large-witness scaling rows 2^15..2^20 (verdict item 3)
timeout 14400 python benchmarks/scaling.py --min-pow 15 --max-pow 20 \
  --kappa 256 > bench_logs/scaling_big.jsonl 2> bench_logs/scaling_big.err
echo "scaling exit: $?" >> bench_logs/campaign.status

echo DONE >> bench_logs/campaign.status
