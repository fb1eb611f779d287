"""Run ONLY bench.py's deterministic quality phase (256px city gate).

For bisecting quality regressions on TPU without paying the 512px perf
phase: each run is ~2000 iterations at 256px (~1-2 min on a v5e chip plus
compiles).  Prints the same JSON keys the bench quality phase records.

The AbsGS densify quantile makes a single trajectory chaotic (tiny kernel-
numerics drift changes which splats cross the threshold, and the selector's
count is ratio x N by construction — the reference's own design,
scene/gaussian_model.py:715-722).  ``--seeds N`` therefore runs N training-
RNG seeds over the SAME scene sequentially (one process = one tunnel
client) and prints a median summary line: judge a kernel change by whether
it moves the MEDIAN outside the seed spread, not by one trajectory.

Usage:  timeout 1200 python -u scripts/quality_gate.py [--seeds N]
"""
import argparse
import json
import os
import sys

import numpy as np

# bench.py lives at the repo root; make the gate cwd-insensitive.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=1,
                    help="number of Trainer RNG seeds (0..N-1) to run")
    args = ap.parse_args()

    import bench

    results = []
    for seed in range(args.seeds):
        out = bench.quality_metric(seed=seed)
        print(json.dumps(out), flush=True)
        results.append(out)

    if len(results) > 1:
        psnrs = [r["quality_psnr_db"] for r in results]
        summary = {
            "quality_psnr_db_median": round(float(np.median(psnrs)), 2),
            "quality_psnr_db_min": min(psnrs),
            "quality_psnr_db_max": max(psnrs),
            "quality_ssim_median": round(float(np.median(
                [r["quality_ssim"] for r in results])), 4),
            "quality_n_splats_median": int(np.median(
                [r["quality_n_splats"] for r in results])),
            "n_seeds": len(results),
        }
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
