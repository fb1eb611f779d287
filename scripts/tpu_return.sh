#!/bin/bash
# TPU-return checklist runner (CLAUDE.md "TPU checklist when the tunnel
# returns").  Runs the unambiguous first stages STRICTLY SEQUENTIALLY —
# one JAX client at a time, per the single-client tunnel gotcha — and
# stops on the first failure so a human (or the driving agent) can apply
# the documented judgment calls (e.g. revert 9fef357 if Mosaic rejects
# the 16-row DMA).  Logs land in runs/tpu_return/.
#
# Usage: bash scripts/tpu_return.sh [stage]
#   stage 1 = smoke_raster (Mosaic accepts 16-row DMA?)
#   stage 2 = bench.py (perf + quality gate)
#   default: run 1 then 2.
set -u
cd "$(dirname "$0")/.."
LOGDIR=runs/tpu_return
mkdir -p "$LOGDIR"

tunnel_up() {
  for p in 8081 8082 8083; do
    timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/$p" 2>/dev/null || return 1
  done
  return 0
}

if ! tunnel_up; then
  echo "TUNNEL DOWN (need all of 8081/8082/8083) — refusing to burn a client" >&2
  exit 2
fi

run_stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== stage $name: $* (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" 2>&1 | tee "$LOGDIR/$name.log"
  local rc=${PIPESTATUS[0]}
  echo "=== stage $name rc=$rc ==="
  return "$rc"
}

STAGE=${1:-all}
if [ "$STAGE" = 1 ] || [ "$STAGE" = all ]; then
  run_stage smoke_raster 900 python -u scripts/smoke_raster.py || {
    echo "smoke_raster FAILED — if Mosaic rejected the 16-row DMA, revert 9fef357" >&2
    exit 1
  }
fi
if [ "$STAGE" = 2 ] || [ "$STAGE" = all ]; then
  run_stage bench 2400 python -u bench.py || exit 1
fi
echo "stages done — next (judgment calls, run manually):"
echo "  timeout 3600 python -u scripts/quality_gate.py --seeds 3   # HEAD, then c2177f8 via scripts/quality_bisect.sh"
echo "  timeout 3600 python -u scripts/quality_512.py"
echo "  timeout 5400 python -u scripts/idu_endurance.py /tmp/idu_end 3 1000"
