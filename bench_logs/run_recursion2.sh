#!/bin/bash
# Recursion payoff campaign, take 2 (vectorized code, tractable configs).
cd /root/repo
set -x
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=

# small q, 2 levels, base small enough to finish on the 2-core box
timeout 7200 python benchmarks/recursion_size.py --cpu --levels 2 \
  --n 8 --r 8 --kappa 64 --kappa-new 16 --mu 8 \
  > bench_logs/recursion_smallq.jsonl 2> bench_logs/recursion_smallq.err
echo "rec-small exit: $?" >> bench_logs/recursion2.status

# big q, 2 levels (norm-tight regime where folding pays)
timeout 10800 python benchmarks/recursion_size.py --cpu --levels 2 --big-q \
  --n 8 --r 8 --kappa 64 --kappa-new 16 --mu 8 \
  > bench_logs/recursion_bigq.jsonl 2> bench_logs/recursion_bigq.err
echo "rec-big exit: $?" >> bench_logs/recursion2.status

# wider mu at level 1 to probe the size crossover
timeout 7200 python benchmarks/recursion_size.py --cpu --levels 1 \
  --n 8 --r 8 --kappa 64 --kappa-new 16 --mu 16 \
  > bench_logs/recursion_mu16.jsonl 2> bench_logs/recursion_mu16.err
echo "rec-mu16 exit: $?" >> bench_logs/recursion2.status

echo DONE >> bench_logs/recursion2.status
