#!/bin/bash
# Round-4 TPU benchmark campaign, take 2 (after the float-Barrett mod fix).
cd /root/repo
set -x

# 1. headline metric (fetch-timed + roofline guard) + e2e numbers
timeout 5400 python bench.py --batch-prove 16 --phases \
  > bench_logs/headline2.json 2> bench_logs/headline2.err
echo "headline2 exit: $?" >> bench_logs/campaign2.status

# 2. headline on the XLA path for the PERF.md comparison row
timeout 3600 python bench.py --no-pallas --skip-e2e \
  > bench_logs/headline2_xla.json 2> bench_logs/headline2_xla.err
echo "headline2-xla exit: $?" >> bench_logs/campaign2.status

# 3. kernel micro-benches (u1/cd/ajtai rows for PERF.md)
timeout 5400 python benchmarks/ajtai_bench.py \
  > bench_logs/ajtai2.log 2>&1
echo "ajtai2 exit: $?" >> bench_logs/campaign2.status
timeout 5400 python benchmarks/cd_bench.py \
  > bench_logs/cd2.log 2>&1
echo "cd2 exit: $?" >> bench_logs/campaign2.status

# 4. large-witness scaling rows 2^15..2^20
timeout 21600 python benchmarks/scaling.py --min-pow 15 --max-pow 20 \
  --kappa 256 > bench_logs/scaling_big.jsonl 2> bench_logs/scaling_big.err
echo "scaling exit: $?" >> bench_logs/campaign2.status

# 5. scaling rows 2^8..2^14 re-measured with honest timing
timeout 14400 python benchmarks/scaling.py --min-pow 8 --max-pow 14 \
  --kappa 256 > bench_logs/scaling_small.jsonl 2> bench_logs/scaling_small.err
echo "scaling-small exit: $?" >> bench_logs/campaign2.status

echo DONE >> bench_logs/campaign2.status
