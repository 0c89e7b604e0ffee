"""The noise-band reporter (tools/ap_spread_report.py) is what PERF.md's
measured band and re-applied headline rule are read from — pin its
grouping/band/rule logic on synthetic rows so a refactor can't silently
change the reported band."""

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [
    # seed0, two checkpoints; k64_ptop4 is fastest and qualifies
    {"config": "seed0_jacobi_k128", "ap150": 0.0037, "mpjpe": 223.7,
     "recall500": 0.850, "epoch": 59, "seed_tag": "seed0"},
    {"config": "seed0_jacobi_k64", "ap150": 0.0065, "mpjpe": 212.2,
     "recall500": 0.908, "epoch": 59, "seed_tag": "seed0"},
    {"config": "seed0_jacobi_k64_ptop4", "ap150": 0.0069, "mpjpe": 219.4,
     "recall500": 0.925, "epoch": 59, "seed_tag": "seed0"},
    {"config": "seed0_jacobi_k128", "ap150": 0.0036, "mpjpe": 226.1,
     "recall500": 0.858, "epoch": 99, "seed_tag": "seed0"},
    {"config": "seed0_jacobi_k64", "ap150": 0.0061, "mpjpe": 214.9,
     "recall500": 0.900, "epoch": 99, "seed_tag": "seed0"},
    {"config": "seed0_jacobi_k64_ptop4", "ap150": 0.0064, "mpjpe": 221.0,
     "recall500": 0.917, "epoch": 99, "seed_tag": "seed0"},
    # a re-seeded arm at the final checkpoint widens the band to 3.8 mm
    {"config": "seed1_jacobi_k128", "ap150": 0.0030, "mpjpe": 229.9,
     "recall500": 0.840, "epoch": 99, "seed_tag": "seed1"},
]


def test_spread_report_band_and_rule(tmp_path):
    path = tmp_path / "spread.jsonl"
    with open(path, "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ap_spread_report.py"),
         str(path)], capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    text = out.stdout
    # band = max spread: cross-seed k128@99 = 229.9-226.1 = 3.8 mm
    assert "full spread 3.8 mm" in text
    # headline rule runs against the epoch-99 seed0 rows; the fastest
    # config (k64_ptop4) is listed first and qualifies
    lines = [ln for ln in text.splitlines() if "->" in ln]
    assert lines[0].strip().startswith("jacobi_k64_ptop4")
    assert "QUALIFIES" in lines[0]
    # a config below baseline recall would not qualify: check the rule
    # output names every contested config exactly once
    names = [ln.strip().split(" ")[0] for ln in lines]
    assert sorted(names) == ["jacobi_k128", "jacobi_k64",
                             "jacobi_k64_ptop4"]
