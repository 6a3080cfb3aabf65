#!/bin/bash
cd /root/repo
timeout 3000 python bench.py --skip-e2e > bench_logs/final_headline.json 2> bench_logs/final_headline.err
echo "final-xla exit $?" >> bench_logs/final_bench.status
timeout 3000 python bench.py --pallas --skip-e2e > bench_logs/final_pallas.json 2> bench_logs/final_pallas.err
echo "final-pallas exit $?" >> bench_logs/final_bench.status
