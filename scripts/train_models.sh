#!/usr/bin/env bash
# Background sweep driver — the reference's train_models_via_bash.sh:1-27:
# source the env config, launch the sweep detached with a timestamped log.
set -euo pipefail

ENV_FILE="${1:-conf/.env}"
LOG_DIR="${LOG_DIR:-./logs}"
mkdir -p "$LOG_DIR"
STAMP="$(date +%Y%m%d_%H%M%S)"
LOG="$LOG_DIR/train_$STAMP.log"

echo "env=$ENV_FILE log=$LOG"
nohup python3 -u -m skinjax.tools.train_cli --env "$ENV_FILE" "$@" \
    > "$LOG" 2>&1 &
echo "pid $!"
