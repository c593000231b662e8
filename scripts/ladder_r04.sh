#!/bin/bash
# Round-4 hyperprior production ladder (VERDICT r3 item #1), fresh start
# (the round-3 interrupted run's working dir did not survive the workspace
# re-clone; only committed files persist between sessions).
#
#   1. lambda=3  : 36 epochs from the factorized rd_synthetic base
#                  (hyper modules from init, strict=False warm start)
#   2. lambda=10/30/100 chained, 14 epochs each
#   3. strip eval-only copies (f16, no optimizer state) for committing
#   4. RD sweep the hyper ladder, MERGE into benchmarks/rd_r04.json
#
# Graceful early stop: touch checkpoints/STOP_LADDER — every fit() checks
# it at each epoch boundary (never kill this script mid-dispatch; orphaned
# relay work wedges the next process).
#
# Run on the real TPU:  nohup bash scripts/ladder_r04.sh > checkpoints/ladder_r04.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
# Callers may pre-set RDVC_STOP_FILE (e.g. to park a hung earlier run via
# its own stop file while this one uses a fresh one); default + clean only
# when unset.
export RDVC_STOP_FILE="${RDVC_STOP_FILE:-$PWD/checkpoints/STOP_LADDER}"
rm -f "$RDVC_STOP_FILE"

echo "== [$(date +%T)] lambda=3 (36 epochs) =="
python scripts/train_rate_points.py \
  --hyperprior --lambdas 3 --epochs "${HP_L3_EPOCHS:-36}" \
  --base checkpoints/rd_synthetic.ckpt || exit 1

echo "== [$(date +%T)] lambda=10/30/100 chained (14 epochs each) =="
python scripts/train_rate_points.py \
  --hyperprior --lambdas 10 30 100 --epochs "${HP_EPOCHS:-14}" \
  --base checkpoints/rate_hp_l3.ckpt || exit 1

echo "== [$(date +%T)] strip eval checkpoints =="
python scripts/strip_ckpt.py checkpoints/rate_hp_l*.ckpt || exit 1

echo "== [$(date +%T)] RD sweep (merge into rd_r04) =="
CKPTS=$(ls checkpoints/rate_hp_l*.ckpt | paste -sd,)
RD_MERGE=1 RD_CKPTS="$CKPTS" RD_HEIGHTS="${HP_RD_HEIGHTS:-1080,720,480,360}" \
  python scripts/make_rd_report.py || exit 1
echo "== [$(date +%T)] ladder complete =="
