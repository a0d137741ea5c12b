#!/usr/bin/env bash
# Accuracy-parity runbook (VERDICT r4 next #9): the moment PAD-UFES-20 data
# and a reference checkpoint are available, one command produces the 5-fold
# BACC deltas vs the published table (frugality_bacc_by_models.py:5-17).
#
# Usage:
#   scripts/parity_runbook.sh <model.pth> <backbone> <metadata.csv> <images/>
# Optional env: MECHANISM (default RG-ATT), KFOLDS (5), OUT (report path).
set -euo pipefail

STATE_DICT=${1:?usage: parity_runbook.sh <model.pth> <backbone> <metadata.csv> <images_dir>}
BACKBONE=${2:?backbone}
CSV=${3:?metadata csv}
IMAGES=${4:?images dir}
MECHANISM=${MECHANISM:-att-intramodal+residual+cross-attention-metadados}
KFOLDS=${KFOLDS:-5}
OUT=${OUT:-./results/parity_${BACKBONE}.json}

mkdir -p "$(dirname "$OUT")"
exec python -m skinjax.tools.parity_runbook \
    --state-dict "$STATE_DICT" \
    --backbone "$BACKBONE" \
    --mechanism "$MECHANISM" \
    --metadata-csv "$CSV" \
    --images-dir "$IMAGES" \
    --k-folds "$KFOLDS" \
    --out "$OUT"
