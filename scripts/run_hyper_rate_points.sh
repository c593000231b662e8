#!/bin/bash
# Hyperprior rate-point ladder + RD report merge (run on the real TPU,
# after scripts/run_tpu_suite.sh).
#
# 1. Fine-tune mean-scale hyperprior checkpoints at several lambda_bpp
#    (warm-starting shared transforms from the factorized base; hyper
#    modules from init — strict=False load).
# 2. Sweep them over the reference's compression-height ladder and MERGE
#    into benchmarks/rd_r03.json + RD_r03.md next to the factorized points.
#
# The hyperprior curve is the rate-control story: the factorized model
# saturates near ~1.3 bpp at 1080p while the conditional-Gaussian model
# reaches the reference's 0.1-1.5 bpp regime (PERF_r03.md, A/B section).
set -u
cd "$(dirname "$0")/.."
LAMBDAS="${HP_LAMBDAS:-3 10 30}"
EPOCHS="${HP_EPOCHS:-10}"
echo "== train hyperprior rate points (lambdas: $LAMBDAS) =="
timeout "${HP_TRAIN_TIMEOUT:-14400}" python scripts/train_rate_points.py \
  --hyperprior --lambdas $LAMBDAS --epochs "$EPOCHS" \
  --base checkpoints/rd_synthetic.ckpt
echo "== RD sweep (merge into rd_r03) =="
CKPTS=$(ls checkpoints/rate_hp_l*.ckpt 2>/dev/null | paste -sd,)
if [ -z "$CKPTS" ]; then
  echo "no hyperprior rate checkpoints produced; aborting sweep" >&2
  exit 1
fi
RD_MERGE=1 RD_CKPTS="$CKPTS" timeout "${HP_SWEEP_TIMEOUT:-10800}" \
  python scripts/make_rd_report.py
