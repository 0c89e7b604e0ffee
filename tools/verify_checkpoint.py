"""One-command fidelity-gate verification (VERDICT r3 item 8 / Missing #2).

The project's fidelity gate is the reference's published Panoptic CMU0
result: AP25 92.3 / MPJPE 16.0 mm from the released
mvgformer_q1024_model.pth.tar (/root/reference/README.md:138-140,
protocol /root/reference/run/validate_3d.py:150-174 +
lib/dataset/panoptic.py:493-764). Neither the checkpoint nor the
Panoptic data exists in this environment, so the gate stays externally
blocked — this tool closes it the day they arrive:

    python tools/verify_checkpoint.py \
        --model_path /path/to/mvgformer_q1024_model.pth.tar \
        --data_root  /path/to/panoptic/

It runs run/validate.py on the flagship config (torch .pth.tar
checkpoints are converted on the fly by utils/torch_convert), takes the
best row across the configured confidence thresholds, and exits nonzero
unless AP25 and MPJPE are within --tolerance (default 0.5%) of the
published numbers.
"""

import argparse
import ast
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "panoptic", "knn5-lr4-q1024.yaml")

PUBLISHED_AP25 = 92.3   # percent
PUBLISHED_MPJPE = 16.0  # mm

METRIC_RE = re.compile(r"thr=[\d.]+\s+(\{.*\})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True,
                    help="released .pth.tar or an orbax checkpoint dir")
    ap.add_argument("--data_root", required=True,
                    help="Panoptic dataset root (CMU0 val sequences)")
    ap.add_argument("--cfg", default=CFG)
    ap.add_argument("--tolerance", type=float, default=0.5,
                    help="max relative deviation, percent")
    ap.add_argument("extra", nargs="*",
                    help="extra KEY.SUB=value overrides for validate.py")
    args = ap.parse_args()

    for path, what in ((args.model_path, "checkpoint"),
                       (args.data_root, "data root")):
        if not os.path.exists(path):
            sys.exit(f"missing {what}: {path}")

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(REPO, "run", "validate.py"),
           "--cfg", args.cfg, "--model_path", args.model_path,
           f"DATASET.ROOT={args.data_root}", *args.extra]
    print("+", " ".join(cmd), flush=True)
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         env=env)
    sys.stdout.write(res.stdout[-4000:])
    sys.stderr.write(res.stderr[-4000:])
    if res.returncode != 0:
        sys.exit(f"validate.py failed (rc={res.returncode})")

    rows = [ast.literal_eval(m.group(1))
            for m in METRIC_RE.finditer(res.stdout + res.stderr)]
    if not rows:
        sys.exit("no metric rows found in validate.py output")
    best = max(rows, key=lambda r: r.get("ap@25", 0.0))
    ap25 = 100.0 * best.get("ap@25", 0.0)
    mpjpe = best.get("mpjpe", float("inf"))
    dev_ap = 100.0 * abs(ap25 - PUBLISHED_AP25) / PUBLISHED_AP25
    dev_mp = 100.0 * abs(mpjpe - PUBLISHED_MPJPE) / PUBLISHED_MPJPE
    print(f"\nbest row: AP25 {ap25:.2f} (published {PUBLISHED_AP25}, "
          f"dev {dev_ap:.2f}%)  MPJPE {mpjpe:.2f} mm (published "
          f"{PUBLISHED_MPJPE}, dev {dev_mp:.2f}%)")
    if dev_ap > args.tolerance or dev_mp > args.tolerance:
        sys.exit(f"FIDELITY GATE FAILED: deviation exceeds "
                 f"{args.tolerance}%")
    print("FIDELITY GATE PASSED")


if __name__ == "__main__":
    main()
