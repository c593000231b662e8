#!/bin/bash
# Continue the round-4 hyperprior rate ladder after an interrupted run
# (the λ=3 fine-tune died at epoch 56/65; checkpoints/rate_hp_l3_run/
# holds its full train-state checkpoint).
#
# 1. resume λ=3 to its target epoch -> checkpoints/rate_hp_l3.ckpt
# 2. train λ=10/30/100 chained (each warm-starts the previous point)
# 3. strip eval-only copies (f16, no opt state) for committing
# 4. RD sweep the hyper ladder and MERGE into benchmarks/rd_r04.json
#
# Run on the real TPU:  bash scripts/continue_hyper_ladder.sh
set -u
cd "$(dirname "$0")/.."
EPOCHS="${HP_EPOCHS:-20}"
HEIGHTS="${HP_RD_HEIGHTS:-1080,720,480}"

if [ ! -f checkpoints/rate_hp_l3.ckpt ]; then
  echo "== resume lambda=3 from rate_hp_l3_run =="
  timeout 7200 python scripts/resume_rate_point.py \
    checkpoints/rate_hp_l3_run --out checkpoints/rate_hp_l3.ckpt || exit 1
fi

echo "== train lambda=10/30/100 chained from rate_hp_l3 =="
timeout 10800 python scripts/train_rate_points.py \
  --hyperprior --lambdas 10 30 100 --epochs "$EPOCHS" \
  --base checkpoints/rate_hp_l3.ckpt || exit 1

echo "== strip eval checkpoints =="
python scripts/strip_ckpt.py checkpoints/rate_hp_l*.ckpt || exit 1

echo "== RD sweep (merge into rd_r04) =="
CKPTS=$(ls checkpoints/rate_hp_l*.ckpt 2>/dev/null | paste -sd,)
RD_MERGE=1 RD_CKPTS="$CKPTS" RD_HEIGHTS="$HEIGHTS" timeout 10800 \
  python scripts/make_rd_report.py || exit 1
echo "== ladder complete =="
