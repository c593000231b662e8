#!/bin/bash
# Round-4 post-ladder measurement queue (run AFTER scripts/ladder_r04.sh
# completes, serially, with the host core otherwise QUIET — see CLAUDE.md:
# a first readback started under CPU load can wedge forever, and timed
# runs share the single core with nothing).
#
#   1. pick checkpoints/bench_hyper.ckpt from the hyper ladder (bpp
#      closest to 0.4 at 1080p comp-res in rd_r04.json; escape-free
#      device-coding regime) — FIRST so the driver's own bench run gets
#      the hyper row even if later steps are cut for time
#   2. RAFT micro-profile (fused update-block A/B vs flax)
#   3. in-graph stage attribution (profile_inloop: true kernel costs +
#      planar-vs-tiled warp A/B + entropy-kernel timings)
#   4. matched-rate sustained run (VERDICT r3 item #4a: rate_l3 at the
#      reference's ~2.8 bpp operating point, 600 frames, interval 32)
#   5. bench self-run (banked artifact with fps + bpp + PSNR +
#      comp-height ladder + hyper row)
#   6. sequence-unrolled fine-tune of rate_l3 (VERDICT r3 item #4b) and a
#      second sustained run with it (drift damping evidence)
#   7. short RSS probe (VERDICT r3 item #7)
#
# Usage: nohup bash scripts/post_ladder_r04.sh > benchmarks/post_ladder_r04.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "== [$(date +%T)] pick bench_hyper.ckpt =="
python - <<'EOF'
import glob, json, shutil, os
best = None
try:
    rd = json.load(open("benchmarks/rd_r04.json"))["results"]
    best_d = 1e9
    for name, rows in rd.items():
        if not name.startswith("rate_hp_"):
            continue
        for r in rows:
            if r["compress_height"] == 1080:
                d = abs(r["bpp"] - 0.4)
                if d < best_d:
                    best, best_d = f"checkpoints/{name}.ckpt", d
except Exception as e:
    print("no rd_r04.json:", e)
if not best or not os.path.exists(best):
    # Sweep missing/failed: take the mid-ladder point if trained.
    cands = sorted(glob.glob("checkpoints/rate_hp_l*.ckpt"))
    best = cands[len(cands) // 2] if cands else None
if best:
    shutil.copyfile(best, "checkpoints/bench_hyper.ckpt")
    print("bench_hyper.ckpt <-", best)
else:
    print("no hyper rate checkpoints exist; bench hyper row will skip")
EOF

echo "== [$(date +%T)] profile_raft_micro =="
timeout 2400 python scripts/profile_raft_micro.py benchmarks/profile_raft_micro_r04.json \
  || echo "profile_raft_micro FAILED"

echo "== [$(date +%T)] profile_inloop =="
timeout 2700 python scripts/profile_inloop.py benchmarks/profile_inloop_r04.json \
  || echo "profile_inloop FAILED"

echo "== [$(date +%T)] matched-rate sustained (rate_l3 @480p comp) =="
# rate_l3 at 480p comp-res sits at ~2 bpp on the RD clip — at/below the
# reference's ~2.8 bpp jockey operating point, so a >=24.5 dB average
# proves the r03 drift was rate, not the pipeline (VERDICT r3 item #4a).
SUST_CKPT=checkpoints/rate_l3.ckpt SUST_CALIB=0 SUST_COMPH=480 \
  SUST_TAG=matchedrate_r04 \
  timeout 3600 python scripts/sustained_run.py || echo "sustained FAILED"



echo "== [$(date +%T)] bench self-run =="
timeout 5400 python bench.py | tee benchmarks/bench_r04_selfrun.json \
  || echo "bench FAILED"

echo "== [$(date +%T)] rss probe =="
timeout 1800 python scripts/rss_probe.py --segments 2 --steps 4 \
  || echo "rss probe FAILED"   # writes benchmarks/rss_probe.json

echo "== [$(date +%T)] sequence fine-tune (rate_l3 -> rate_l3_seq) =="
timeout 2700 python scripts/train_sequence_finetune.py \
  --base checkpoints/rate_l3.ckpt --epochs 8 \
  || echo "seq finetune FAILED"

if [ -f checkpoints/rate_l3_seq.ckpt ]; then
  echo "== [$(date +%T)] sustained with the sequence fine-tune =="
  SUST_CKPT=checkpoints/rate_l3_seq.ckpt SUST_CALIB=0 SUST_COMPH=480 \
    SUST_TAG=seqft_r04 \
    timeout 3600 python scripts/sustained_run.py || echo "sustained-seq FAILED"
fi

echo "== [$(date +%T)] multichip dryrun smoke (quiet host) =="
timeout 1800 python - <<'EOF' || echo "multichip smoke FAILED"
import time, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import __graft_entry__ as g
t0 = time.time()
fn, args = g.entry()
fn(*args)
t1 = time.time()
g.dryrun_multichip(8)
t2 = time.time()
out = {"ok": True, "entry_s": round(t1 - t0, 1),
       "dryrun_s": round(t2 - t1, 1)}
json.dump(out, open("benchmarks/multichip_smoke_r04.json", "w"))
print(out)
EOF

echo "== [$(date +%T)] post-ladder queue complete =="
