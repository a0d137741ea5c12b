#!/usr/bin/env bash
# NAS search driver (the reference's nas/*_via_bash.sh): detached run with a
# timestamped log. Strategy and steps come from args or the .env SEARCH_STEPS.
set -euo pipefail

STRATEGY="${1:-reinforce}"
shift || true
LOG_DIR="${LOG_DIR:-./logs}"
mkdir -p "$LOG_DIR"
LOG="$LOG_DIR/nas_${STRATEGY}_$(date +%Y%m%d_%H%M%S).log"

echo "strategy=$STRATEGY log=$LOG"
nohup python3 -u -m skinjax.tools.nas_cli --strategy "$STRATEGY" "$@" \
    > "$LOG" 2>&1 &
echo "pid $!"
