#!/bin/bash
# $1 = label, $2 = cache dir
cd /root/repo
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= LABRADOR_COMPILE_CACHE="$2"
timeout 7200 python -m pytest tests/ -q > "bench_logs/suite_$1.out" 2>&1
code=$?
tail -3 "bench_logs/suite_$1.out" > "bench_logs/suite_$1.log"
echo "${1}_EXIT=$code" >> "bench_logs/suite_$1.log"
