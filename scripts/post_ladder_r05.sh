#!/bin/bash
# Round-5 post-ladder measurement queue (run AFTER the lambda=30/100
# hyperprior fine-tunes complete; strictly serial, host otherwise QUIET
# — CLAUDE.md single-core + relay rules).
#
#   1. strip the new rate-point checkpoints to eval form
#   2. RD sweep (1080p + 720p comp-heights) over the hyperprior ladder
#      -> benchmarks/rd_r05.json + RD_r05.md (merges the r04/r03 points)
#   3. re-pick checkpoints/bench_hyper.ckpt = hyper point closest to
#      0.4 bpp at 1080p comp-res (escape-free device-coding regime)
#   4. matched-rate sustained run (VERDICT r3 #4a / r4 #5: rate_l3 at
#      480p comp ~2 bpp >= reference's jockey 2.8 bpp regime is NOT
#      reachable; this tests drift-vs-rate at the highest in-repo rate)
#   5. short RSS probe (VERDICT r4 #8)
#
# Usage: nohup bash scripts/post_ladder_r05.sh > /tmp/post_ladder_r05.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "== [$(date +%T)] strip new hyper rate points =="
for c in checkpoints/rate_hp_l30.ckpt checkpoints/rate_hp_l100.ckpt; do
  [ -f "$c" ] && python - "$c" <<'EOF'
import json, sys
path = sys.argv[1]
with open(path, "rb") as f:
    f.read(8); n = int.from_bytes(f.read(8), "big")
    meta = json.loads(f.read(n))
print(path, "stripped?" , "stripped" in meta)
raise SystemExit(0 if "stripped" in meta else 1)
EOF
  if [ $? -ne 0 ]; then python scripts/strip_ckpt.py "$c"; fi
done

echo "== [$(date +%T)] RD sweep (hyper ladder, 1080+720 comp) =="
RD_MERGE=1 RD_HEIGHTS=1080,720 RD_FRAMES=16 \
  RD_CKPTS=checkpoints/rate_hp_l3.ckpt,checkpoints/rate_hp_l30.ckpt,checkpoints/rate_hp_l100.ckpt \
  timeout 5400 python scripts/make_rd_report.py || echo "RD sweep FAILED"

echo "== [$(date +%T)] re-pick bench_hyper.ckpt =="
python - <<'EOF'
import json, os
best, best_d = None, 1e9
try:
    rd = json.load(open("benchmarks/rd_r05.json"))["results"]
    for name, rows in rd.items():
        if not name.startswith("rate_hp_"):
            continue
        for r in rows:
            if r["compress_height"] == 1080:
                d = abs(r["bpp"] - 0.4)
                if d < best_d:
                    best, best_d = f"checkpoints/{name}.ckpt", d
except Exception as e:
    print("rd_r05.json unusable:", e)
if best and os.path.exists(best):
    tgt = "checkpoints/bench_hyper.ckpt"
    if os.path.islink(tgt) or os.path.exists(tgt):
        os.remove(tgt)
    os.symlink(os.path.basename(best), tgt)
    print("bench_hyper.ckpt ->", best)
else:
    print("keeping existing bench_hyper.ckpt")
EOF

echo "== [$(date +%T)] matched-rate sustained (rate_l3 @480p comp) =="
SUST_CKPT=checkpoints/rate_l3.ckpt SUST_CALIB=0 SUST_COMPH=480 \
  SUST_TAG=matchedrate_r05 \
  timeout 3600 python scripts/sustained_run.py || echo "sustained FAILED"

echo "== [$(date +%T)] rss probe =="
timeout 1800 python scripts/rss_probe.py --segments 2 --steps 4 \
  || echo "rss probe FAILED"

echo "== [$(date +%T)] r05 post-ladder queue complete =="
