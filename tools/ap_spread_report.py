"""Render the AP noise-band measurement (VERDICT r4 item 3).

Reads perf/ap_ablation_spread.jsonl (written by `tools/ap_ablation.py
spread` — the contested configs k128 / k64 / k64_ptop4 evaluated at the
three retained late-training checkpoints, optionally across re-seeded
runs) and prints:

  1. the raw rows as a markdown table,
  2. per-config MPJPE / recall@500 spread (min-max across epochs within
     a seed; across seeds at matching epochs when a seed-1 arm exists),
  3. the MEASURED noise band (max within-config spread) and the
     headline rule re-applied against it: fastest config with
     MPJPE <= k128_baseline + band AND recall >= k128_baseline.

Protocol anchor: /root/reference/lib/dataset/panoptic.py:493-764 (the
per-threshold AP evaluation this proxy mirrors). Pure reporting — no
TPU needed.
"""

import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPREAD = os.path.join(REPO, "perf", "ap_ablation_spread.jsonl")

# bench fps at each contested config (perf/bench_rows_r05.jsonl) for the
# headline rule's "fastest qualifying" ordering
FPS = {"jacobi_k128": 7.97, "jacobi_k64": 8.89, "jacobi_k64_ptop4": 10.39}


def load(path=SPREAD):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else SPREAD
    rows = load(path)
    if not rows:
        sys.exit(f"no rows in {path}")

    print("| seed | epoch | config | AP150 | MPJPE (mm) | recall@500 |")
    print("|---|---|---|---|---|---|")
    by_cfg = defaultdict(list)
    for r in rows:
        seed = r.get("seed_tag", "seed0")
        base = r["config"]
        for pref in ("seed0_", "seed1_", "seed2_"):
            if base.startswith(pref):
                base = base[len(pref):]
        print(f"| {seed} | {r.get('epoch', '?')} | {base} | "
              f"{(r.get('ap150') or 0.0):.4f} | {r['mpjpe']:.2f} | "
              f"{r['recall500']:.4f} |")
        by_cfg[(seed, base)].append(r)

    print("\nPer-config spread across checkpoints (within one seed):")
    band = 0.0
    recall_band = 0.0
    for (seed, cfg), rs in sorted(by_cfg.items()):
        mp = [r["mpjpe"] for r in rs]
        rc = [r["recall500"] for r in rs]
        sp = max(mp) - min(mp)
        rsp = max(rc) - min(rc)
        band = max(band, sp)
        recall_band = max(recall_band, rsp)
        print(f"  {seed}/{cfg}: mpjpe {min(mp):.1f}-{max(mp):.1f} "
              f"(spread {sp:.1f} mm), recall {min(rc):.3f}-{max(rc):.3f}"
              f" (spread {rsp:.3f}), n={len(rs)}")

    # cross-seed spread at matching (epoch, config), if a re-seed exists
    seeds = sorted({s for s, _ in by_cfg})
    if len(seeds) > 1:
        print("\nCross-seed spread at matching (epoch, config):")
        by_ec = defaultdict(list)
        for r in rows:
            base = r["config"]
            for pref in ("seed0_", "seed1_", "seed2_"):
                if base.startswith(pref):
                    base = base[len(pref):]
            by_ec[(r.get("epoch"), base)].append(r["mpjpe"])
        xs = []
        for (ep, cfg), mp in sorted(by_ec.items()):
            if len(mp) > 1:
                xs.append(max(mp) - min(mp))
                print(f"  epoch {ep} / {cfg}: "
                      f"{min(mp):.1f}-{max(mp):.1f} "
                      f"(spread {max(mp)-min(mp):.1f} mm)")
        if xs:
            band = max(band, max(xs))

    print(f"\nMEASURED noise band: +/-{band/2:.1f} mm MPJPE "
          f"(full spread {band:.1f} mm), recall spread "
          f"{recall_band:.3f}. (Round-4 table INFERRED +/-4 mm from "
          f"near-identical-semantics rows.)")

    # headline rule against the latest-epoch seed0 rows
    last_ep = max(r.get("epoch", -1) for r in rows)
    final = {}
    for (seed, cfg), rs in by_cfg.items():
        if seed != "seed0":
            continue
        for r in rs:
            if r.get("epoch") == last_ep:
                final[cfg] = r
    if "jacobi_k128" in final:
        b = final["jacobi_k128"]
        print(f"\nHeadline rule vs k128 baseline at epoch {last_ep} "
              f"(mpjpe {b['mpjpe']:.1f}, recall {b['recall500']:.3f}), "
              f"band {band:.1f} mm:")
        for cfg in sorted(final, key=lambda c: -FPS.get(c, 0.0)):
            r = final[cfg]
            ok = (r["mpjpe"] <= b["mpjpe"] + band
                  and r["recall500"] >= b["recall500"])
            margin = b["mpjpe"] - r["mpjpe"]
            units = margin / band if band else float("inf")
            print(f"  {cfg} ({FPS.get(cfg, 0):.2f} fps): "
                  f"mpjpe margin {margin:+.1f} mm = {units:+.1f} band "
                  f"units, recall {r['recall500']:.3f} -> "
                  f"{'QUALIFIES' if ok else 'no'}")


if __name__ == "__main__":
    main()
