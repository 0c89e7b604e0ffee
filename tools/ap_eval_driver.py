"""Phased driver for the AP-ablation eval matrix (tools/ap_ablation.py).

The matrix's cost is ~all XLA compile time (each config is its own
program; execution over 48 proxy frames is seconds), and this
environment has a cross-process persistent compile cache (~40 s re-runs,
PERF.md "measurement traps"). So the matrix is driven in two phases:

  warm  — run every config against whatever checkpoint exists (e.g. the
          epoch-20 one the fast trainer writes mid-run), CONCURRENTLY
          with training: the eval's chip occupancy is negligible next to
          its compile, so training throughput is barely touched while
          the compile cache fills. Rows land in the _warm results file —
          a preview, not the committed table.
  final — re-run every config against the finished checkpoint; each is
          now a cache hit. Rows land in perf/ap_ablation_results.jsonl
          (the table PERF.md commits).

Usage:
    python tools/ap_eval_driver.py warm|final [--windowed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ap_ablation


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "final"
    if phase not in ("warm", "final"):
        sys.exit(f"unknown phase {phase!r}; expected warm|final")
    if phase == "warm":
        ap_ablation.RESULTS = os.path.join(
            ap_ablation.PERF_DIR, "ap_ablation_results_warm.jsonl")
    os.makedirs(ap_ablation.PERF_DIR, exist_ok=True)
    ap_ablation.evaluate(windowed="--windowed" in sys.argv)


if __name__ == "__main__":
    main()
