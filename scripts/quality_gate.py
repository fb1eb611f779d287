"""Run ONLY bench.py's deterministic quality phase (256px city gate).

For bisecting quality regressions on TPU without paying the 512px perf
phase: each run is ~2000 iterations at 256px (~1-2 min on a v5e chip plus
compiles).  Prints the same JSON keys the bench quality phase records.

Usage:  timeout 1200 python -u scripts/quality_gate.py
"""
import json
import sys

sys.path.insert(0, ".")


def main():
    import bench

    out = bench.quality_metric()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
