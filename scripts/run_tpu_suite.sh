#!/bin/bash
# Full TPU measurement suite (run on the real device, in order of value):
#   1. bench.py          — headline fps + MFU + wall accounting (driver metric)
#   2. profile_stages.py — isolated per-stage device times (attribution)
#   3. train_bench.py    — trainer steps/s at the reference's batch/crop config
#   4. sustained_run.py  — 600-frame jockey.txt scenario
# Each step logs separately; a failure does not stop the next step.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks
echo "== bench =="
timeout 5400 python bench.py | tee benchmarks/bench_latest.json
echo "== profile_stages =="
timeout 3600 python scripts/profile_stages.py benchmarks/profile_stages_latest.json
echo "== train_bench =="
timeout 3600 python scripts/train_bench.py benchmarks/train_bench.json
echo "== hyperprior A/B (production arch) =="
AB_CPU=0 AB_FULL=1 AB_CROP=128 AB_STEPS=200 timeout 5400 \
  python scripts/ab_hyperprior.py benchmarks/ab_hyperprior_tpu.json
echo "== sustained (600 frames) =="
timeout 10800 python scripts/sustained_run.py
