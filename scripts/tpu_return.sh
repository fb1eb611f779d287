#!/bin/bash
# TPU-return checklist runner (CLAUDE.md "TPU checklist when the tunnel
# returns").  Runs the unambiguous first stages STRICTLY SEQUENTIALLY —
# one JAX client at a time, per the single-client tunnel gotcha — and
# stops on the first failure so a human (or the driving agent) can apply
# the documented judgment calls (e.g. revert 9fef357 if Mosaic rejects
# the 16-row DMA).  Logs land in runs/tpu_return/.
#
# Usage: bash scripts/tpu_return.sh [stage]
#   stage 1 = smoke_raster (parity + r5 early-exit/zfill runtime validation)
#   stage 2 = bench.py (perf + 3-seed quality gate)
#   stage 3 = quality_gate --seeds 3 at HEAD (bisect vs c2177f8 is manual)
#   stage 4 = quality_512 (production-resolution anchor)
#   stage 5 = idu_endurance (Stage-2 curriculum)
#   default: run 1 then 2 (3-5 are long; invoke explicitly).
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
    echo "smoke_raster FAILED — Mosaic compile acceptance was proven by" >&2
    echo "BENCH_r03/r04; a failure here is a RUNTIME divergence in the r5" >&2
    echo "early-exit paths (3bf2869) — bisect with scripts/quality_bisect.sh" >&2
    exit 1
  }
fi
if [ "$STAGE" = 2 ] || [ "$STAGE" = all ]; then
  run_stage bench 3600 python -u bench.py || exit 1
fi
if [ "$STAGE" = 3 ]; then
  run_stage quality_gate 3600 python -u scripts/quality_gate.py --seeds 3 || exit 1
  echo "now compare against c2177f8: bash scripts/quality_bisect.sh (COMMITS=\"c2177f8 HEAD\" SEEDS=3 for endpoints first)"
fi
if [ "$STAGE" = 4 ]; then
  run_stage quality_512 3600 python -u scripts/quality_512.py || exit 1
fi
if [ "$STAGE" = 5 ]; then
  run_stage idu_endurance 5400 python -u scripts/idu_endurance.py /tmp/idu_end 3 1000 || exit 1
fi
if [ "$STAGE" = all ]; then
  echo "stages 1-2 done — next (judgment calls, run explicitly):"
  echo "  bash scripts/tpu_return.sh 3   # quality gate seeds at HEAD"
  echo "  bash scripts/tpu_return.sh 4   # 512px anchor"
  echo "  bash scripts/tpu_return.sh 5   # Stage-2 endurance"
fi
