#!/bin/bash
# Recursion payoff campaign (verdict item 4) — CPU backend, parallel-safe
# with the TPU campaign.
cd /root/repo
set -x
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=

# small q, 2 levels, default fold params
timeout 7200 python benchmarks/recursion_size.py --cpu --levels 2 \
  > bench_logs/recursion_smallq.jsonl 2> bench_logs/recursion_smallq.err
echo "rec-small exit: $?" >> bench_logs/recursion.status

echo DONE >> bench_logs/recursion.status
