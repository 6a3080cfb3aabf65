#!/bin/bash
# wait for scaling_small (TPU busy), then run the 2^20 one-off config
cd /root/repo
while ! grep -q "scaling-small exit" bench_logs/campaign2.status; do sleep 30; done
timeout 7200 python benchmarks/scaling.py --config 512 32 --kappa 256 \
  > bench_logs/scaling_2e20.jsonl 2> bench_logs/scaling_2e20.err
echo "2e20 exit: $?" >> bench_logs/campaign2.status
