#!/usr/bin/env bash
# Missing-data robustness sweep driver (the reference's
# run_missing_data_inference.sh): validate the setup, then run the 5-fold x
# 6-rate sweep appending to missing_metadata_experiment.csv.
set -euo pipefail

: "${METADATA_CSV:?set METADATA_CSV}"
: "${IMAGES_DIR:?set IMAGES_DIR}"
OUT="${OUT:-./results/xai}"

python3 -m skinjax.tools.validate_setup --metadata-csv "$METADATA_CSV" \
    --images-dir "$IMAGES_DIR" ${FEATURIZER:+--featurizer "$FEATURIZER"}

for FOLD in 1 2 3 4 5; do
  python3 -m skinjax.tools.xai_cli missing-data \
      --metadata-csv "$METADATA_CSV" --images-dir "$IMAGES_DIR" \
      ${FEATURIZER:+--featurizer "$FEATURIZER"} \
      ${CHECKPOINT:+--checkpoint "$CHECKPOINT"} \
      --fold "$FOLD" --out "$OUT" "$@"
done
