#!/bin/bash
# Bisect the 256px quality-gate regression (23.2 dB/6300 splats at c2177f8 ->
# 22.6 dB/12441 splats in BENCH_r03) across the ops/rasterize_tiled.py commits
# that are the only source change in that window (VERDICT round 3, item 2):
#   c2177f8  24-row layout, distributed backward algebra  (the 23.2 dB record)
#   9fef357  16-row packed attribute table
#   1748360  backward algebra factored through u,v
#   11dfaba  dead negations dropped, post-reduced scales
#   3bf2869  true-product transmittance carry (r5: semantics fix — keep now
#            matches the oracle's prefix property; trajectories MAY shift)
#   3c07e26  backward division/dop_px fold (r5: reassociation, ~2e-7 rel)
#   HEAD     current
#
# CPU-interpret parity says old/new kernels agree to ~1e-7 rel, so any
# trajectory split is TPU-numerics (fusion-order) drift amplified through the
# densify quantile — only measurable on hardware.  Each gate run is ~2000
# iterations at 256px (~2 min + 30-90 s compile per fresh jit signature).
#
# TPU-sequential: run ALONE (single axon client; see CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
F=skyfall_gs_tpu/ops/rasterize_tiled.py
OUT=${1:-/tmp/quality_bisect}
SEEDS=${SEEDS:-1}   # SEEDS=3 for a chaos-aware median per commit (slower)
# COMMITS="c2177f8 HEAD" for the cheap endpoint comparison first (checklist
# step 3); only bisect the middle commits if the endpoints separate.
COMMITS=${COMMITS:-"c2177f8 9fef357 1748360 11dfaba 3bf2869 3c07e26 HEAD"}
# Refuse to clobber in-flight kernel work: the file is overwritten per
# commit and trap-restored to HEAD, which would destroy uncommitted edits.
if ! git diff --quiet HEAD -- "$F"; then
  echo "$F has uncommitted changes; commit or stash them first" >&2
  exit 1
fi
mkdir -p "$OUT"
trap 'git checkout HEAD -- "$F"' EXIT

for C in $COMMITS; do
  git show "$C:$F" > "$F" || { echo "git show $C failed"; exit 1; }
  echo "=== $C ===" | tee -a "$OUT/log.txt"
  timeout $((1800 * SEEDS)) python -u scripts/quality_gate.py --seeds "$SEEDS" \
    2>&1 | tee "$OUT/$C.full.log" | tail -4 | tee -a "$OUT/log.txt"
done
echo "results in $OUT/log.txt"
