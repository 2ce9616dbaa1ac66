#!/usr/bin/env bash
# Chip-window orchestrator: when the axon TPU relay returns, run every
# hardware-queued measurement in strict priority order, each under a
# timeout, logging to logs/chip_window/. The relay has died mid-session
# twice (BENCH_NOTES.md) — assume any window can end at any moment, so the
# most important number (the official headline bench) runs FIRST and every
# step flushes its results to disk before the next begins.
#
# Usage: bash tools/chip_window.sh [--skip-campaign]
#
# Priority order (rationale in BENCH_NOTES.md / VERDICT.md):
#   1. bench.py               — official headline + 17.6k/200k/1M scale sweep
#   2. ab_bench               — layout/precision/block_rows decisions at 17.6k
#   3. scale_bench variants   — transposed + bf16 at 200k/1M (the regime they
#                               are predicted to pay off in)
#   4. profile_1m_step        — stage attribution at 1M for further tuning
#   5. GT_LARGE_QUALITY gate  — 10k-Gaussian / 512x512 quality proxy
#   6. 1.9B campaign resume   — longest job last; STOP file halts it cleanly

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=logs/chip_window
mkdir -p "$LOG"
STAMP=$(date -u +%Y%m%dT%H%M%S)

probe() {
  python - <<'EOF'
import socket, sys
up = [p for p in (8082, 8083, 8087) if not socket.socket().connect_ex(("127.0.0.1", p))]
sys.exit(0 if up else 1)
EOF
}

run_step() {  # run_step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if ! probe; then
    echo "[$name] SKIPPED — relay went down" | tee -a "$LOG/summary_$STAMP.log"
    return 1
  fi
  echo "=== [$name] $(date -u +%H:%M:%S) timeout=${tmo}s: $*" | tee -a "$LOG/summary_$STAMP.log"
  timeout "$tmo" "$@" >"$LOG/${name}_$STAMP.log" 2>&1
  local rc=$?
  echo "[$name] rc=$rc ($(tail -c 400 "$LOG/${name}_$STAMP.log" | tr '\n' ' '))" \
    | tee -a "$LOG/summary_$STAMP.log"
  return 0
}

if ! probe; then
  echo "chip_window: relay is DOWN — nothing to do" >&2
  exit 3
fi
echo "chip_window: relay UP at $(date -u) — starting priority queue" \
  | tee -a "$LOG/summary_$STAMP.log"

# 1. Official bench (headline + scale sweep in one JSON line).
run_step bench 2400 python bench.py || exit 3
cp -f "$LOG/bench_$STAMP.log" BENCH_LIVE.txt

# 2. Config decisions at 17.6k: layouts, precision, superchunk sizes.
run_step ab_17k 2400 python tools/ab_bench.py \
  stream stream_transposed stream_bf16 stream_br1024 stream_br4096 stream_ch64 || exit 3

# 3. Scale-regime A/B (200k + 1M) for the two opt-in variants.
run_step scale_transposed 3000 python tools/scale_bench.py --variant transposed 200000 1000000 || exit 3
run_step scale_bf16 3000 python tools/scale_bench.py --variant bf16 200000 1000000 || exit 3

# 4. 1M stage attribution.
run_step profile_1m 2400 python tools/profile_1m_step.py || exit 3

# 5. Large GT-recovery quality gate (opt-in test sized for the chip).
run_step gt_large 5400 env GT_LARGE_QUALITY=1 python -m pytest \
  tests/test_quality.py -q -k large || exit 3

# 6. Campaign resume (the long job; safe to interrupt — checkpoints + STOP file).
if [ "${1:-}" != "--skip-campaign" ]; then
  run_step campaign 28800 python tools/stacked_campaign.py --resume --eval || exit 3
fi

echo "chip_window: queue complete at $(date -u)" | tee -a "$LOG/summary_$STAMP.log"
