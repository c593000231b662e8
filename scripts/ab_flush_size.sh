#!/bin/bash
# Encode flush-size A/B (run alone on the real TPU, after run_tpu_suite.sh).
#
# Each encode flush costs ~3 relay round trips (one packed-meta download +
# two word-prefix downloads) and relay round-trip latency dominates
# enc_assemble time (profile_stages enc_assemble_host ~190 ms/frame vs
# ~67 ms/frame device compute). With iframe_interval 32, batch 8 means 4
# flushes/GOP; batch 16 -> 2; batch 31 -> 1. Bigger batches also compile
# larger chain graphs and carry more padding on the tail flush — this
# measures where the tradeoff lands.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks
for B in "$@"; do
  echo "== bench encode_batch_size=$B =="
  BENCH_ENCODE_BATCH="$B" timeout 5400 python bench.py \
    | tee "benchmarks/bench_flush_b${B}.json"
done
python - "$@" <<'EOF'
import json, sys
for b in sys.argv[1:]:
    try:
        d = json.load(open(f"benchmarks/bench_flush_b{b}.json"))
    except Exception as e:
        print(b, "failed:", e); continue
    det = d.get("detail", {})
    acc = det.get("wall_accounting", {})
    print(f"B={b}: combined {d['value']} fps | enc {det.get('encode_fps')} "
          f"dec {det.get('decode_fps')} | enc_wall {acc.get('encode', {})}")
EOF
