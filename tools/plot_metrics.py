"""Offline tool: plot training curves from the JSONL metrics stream.

Rebuild of the reference's log-analysis tooling
(/root/reference/process/extract_number.py: parses stdout logs and plots
per-layer loss curves). Ours reads the structured metrics.jsonl written by
utils.logging.ExperimentTracker, so no log scraping is needed.

Usage:
    python tools/plot_metrics.py <run_dir>/metrics.jsonl \
        [--keys train/total eval/ap@25] [--out curves.png]
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics", help="path to metrics.jsonl")
    ap.add_argument("--keys", nargs="*", default=None,
                    help="metric keys to plot (default: every train/ "
                         "loss key + eval/ap@25 + eval/mpjpe)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    records = [json.loads(line) for line in open(args.metrics)
               if line.strip()]
    if not records:
        raise SystemExit("empty metrics file")

    keys = args.keys
    if not keys:
        all_keys = {k for r in records for k in r
                    if k not in ("t", "step", "epoch")}
        keys = sorted(k for k in all_keys
                      if k.startswith("train/") and "loss" in k.lower()
                      or "total" in k.lower()
                      or k in ("eval/ap@25", "eval/mpjpe"))
    if not keys:
        raise SystemExit("no plottable keys found")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(keys)
    cols = min(n, 3)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3.2 * rows))
    axes = [axes] if n == 1 else list(axes.reshape(-1))
    for ax, key in zip(axes, keys):
        xs = [r.get("step", r.get("epoch", i))
              for i, r in enumerate(records) if key in r]
        ys = [r[key] for r in records if key in r]
        ax.plot(xs, ys, marker="o", ms=2)
        ax.set_title(key)
        ax.set_xlabel("step")
        ax.grid(alpha=0.3)
    for ax in axes[n:]:
        ax.set_axis_off()
    out = args.out or os.path.join(os.path.dirname(args.metrics),
                                   "curves.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out} ({len(records)} records, keys: {keys})")


if __name__ == "__main__":
    main()
