"""Synthetic-AP ablation harness (VERDICT r2 item 2).

Trains the flagship-proxy (configs/synthetic_ap_ablation.yaml) to
convergence on SyntheticDataset, then tables AP25/MPJPE across the
AP-affecting inference knobs:

    {svd(linalg), eigh, jacobi} triangulation solvers
  x {dense, top-K 256/128/64} query compaction
  x {windowed layer-1 sampling on/off} (jacobi x {dense, K=128} only)

The resulting table justifies (or forbids) the bench.py production
defaults. Protocol anchor: the reference evaluates AP/MPJPE per
confidence threshold after NMS (/root/reference/lib/dataset/
panoptic.py:493-764); eval here reuses the run/validate.py CLI unchanged.

Usage:
    python tools/ap_ablation.py train    # ~1h on the TPU
    python tools/ap_ablation.py eval     # ~1h (14 jitted configs)
    python tools/ap_ablation.py all
"""

import ast
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "synthetic_ap_ablation.yaml")
OUT = os.path.join(REPO, "output", "ap_ablation")
# Results land in the TRACKED perf/ dir, not the gitignored output/:
# round 3's table evaporated with output/ between rounds.
PERF_DIR = os.path.join(REPO, "perf")
RESULTS = os.path.join(PERF_DIR, "ap_ablation_results.jsonl")


def run(script, *args, timeout=7200, out_dir=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":/root/.axon_site:" + env.get(
        "PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(REPO, "run", script),
           "--cfg", CFG, f"OUTPUT_DIR={out_dir or OUT}", *args]
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                          timeout=timeout, env=env)


def find_checkpoint(root_dir=None):
    for root, dirs, _ in os.walk(root_dir or OUT):
        if "checkpoints" in dirs:
            return os.path.join(root, "checkpoints")
    raise FileNotFoundError(f"no checkpoints under {root_dir or OUT}")


def train(*overrides, out_dir=None):
    """Drive the device-resident fast trainer (tools/ap_train_fast.py):
    run/train.py's per-step host costs (~21 s/step through the axon
    relay) make the general loop unusable on this 48-frame proxy."""
    t0 = time.time()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":/root/.axon_site:" + env.get(
        "PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(REPO, "tools", "ap_train_fast.py"),
           "--out", out_dir or OUT, *overrides]
    print("+", " ".join(cmd), flush=True)
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=14400, env=env)
    print(res.stdout[-3000:])
    print(res.stderr[-3000:])
    if res.returncode != 0:
        sys.exit("training failed")
    print(f"trained in {(time.time()-t0)/60:.1f} min")


def train_solver(solvers=("eigh",), overrides=()):
    """The training-solver comparison (VERDICT r2 item 4 / r3 item 4).
    The main `train` mode uses jacobi (fastest stable solver; see
    configs/synthetic_ap_ablation.yaml); this trains the alternatives
    via the device-resident fast trainer so PERF.md can table the
    training-AP effect of the solver choice. Pass solver names on the
    CLI to select: `python tools/ap_ablation.py train_solver eigh
    linalg`. Note the round-3 "svd (linalg) NaNs in epoch 0" claim
    predates TRI_GRAD_CLIP — a linalg run here IS the re-verification
    (watch notfinite_total in fast_train_metrics.jsonl: a climbing
    counter means updates are being dropped, not applied)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":/root/.axon_site:" + env.get(
        "PYTHONPATH", "")
    for solver in solvers:
        out_dir = os.path.join(OUT, f"train_{solver}")
        os.makedirs(out_dir, exist_ok=True)
        cmd = [sys.executable, os.path.join(REPO, "tools",
                                            "ap_train_fast.py"),
               "--out", out_dir,
               f"DECODER.triangulation_method={solver}", *overrides]
        print("+", " ".join(cmd), flush=True)
        res = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=REPO, timeout=14400, env=env)
        print(res.stdout[-2000:])
        if res.returncode != 0:
            print(res.stderr[-3000:])
            continue
        ckpt = find_checkpoint(out_dir)
        eval_config(f"trained_{solver}_eval_{solver}_k128",
                    [f"DECODER.triangulation_method={solver}",
                     "DECODER.inference_topk_queries=128"], ckpt)


METRIC_RE = re.compile(r"thr=[\d.]+\s+(\{.*\})")


def eval_config(name, overrides, ckpt, step=None, extra_fields=None):
    t0 = time.time()
    extra = ["--model_step", str(step)] if step is not None else []
    res = run("validate.py", "--model_path", ckpt, *extra, *overrides,
              timeout=3600)
    combined = res.stdout + res.stderr
    m = METRIC_RE.search(combined)
    if res.returncode != 0 or not m:
        print(f"[{name}] FAILED\n{combined[-2000:]}")
        return None
    metrics = ast.literal_eval(m.group(1))
    row = {"config": name, "ap25": metrics.get("ap@25"),
           "ap50": metrics.get("ap@50"), "ap100": metrics.get("ap@100"),
           "ap150": metrics.get("ap@150"),
           "mpjpe": metrics.get("mpjpe"),
           "recall500": metrics.get("recall@500"),
           "wall_s": round(time.time() - t0, 1)}
    if extra_fields:
        row.update(extra_fields)
    print(json.dumps(row), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def evaluate(windowed=None):
    if windowed is None:  # back-compat: derive from CLI flags
        windowed = "--windowed" in sys.argv
    ckpt = find_checkpoint()
    print("checkpoint:", ckpt)
    # 13 configs: each eval is its own XLA compile (~5-10 min on the
    # proxy), so the matrix carries only decision-relevant points:
    # the topk sweep on the production solver, the solver comparison at
    # the production K (+ dense linalg as the closest-to-reference
    # anchor), and the windowed/clamp fast-path rows.
    configs = []
    for solver, topks in (("jacobi", (None, 256, 128, 64)),
                          ("linalg", (None, 128)),
                          ("eigh", (128,))):
        for topk in topks:
            name = f"{solver}_{'dense' if topk is None else f'k{topk}'}"
            ov = [f"DECODER.triangulation_method={solver}"]
            if topk is not None:
                ov.append(f"DECODER.inference_topk_queries={topk}")
            configs.append((name, ov))
    # point sparsification (DECODER.inference_point_topm): top-m of the
    # P=8 attention points per (query, head, level), renormalized —
    # the row-count lever for the gather wall (PERF.md). Evaluated
    # early (decision-relevant: candidate headline configs), including
    # the k64 combos bench_detail times.
    for topk in (128, 64):
        for m in (4, 2):
            configs.append((f"jacobi_k{topk}_ptop{m}",
                            ["DECODER.triangulation_method=jacobi",
                             f"DECODER.inference_topk_queries={topk}",
                             f"DECODER.inference_point_topm={m}"]))
    # clamped layer-1 offsets (DECODER.layer1_offset_clamp): the
    # semantics-changing window-shrinking lever; the clamp's AP cost is
    # the gather rows below. Windowed rows are intentionally absent:
    # window_sample is exactness-tested against the gather at equal
    # semantics (tests/test_window_sampling.py), so windowed AP ==
    # clamp-gather AP by construction and each row would only re-spend
    # a ~8 min eval compile. Pass --windowed to add them back.
    for clamp in (4.0, 2.0):
        base = ["DECODER.triangulation_method=jacobi",
                "DECODER.inference_topk_queries=128",
                f"DECODER.layer1_offset_clamp={clamp}"]
        configs.append((f"jacobi_k128_clamp{int(clamp)}", list(base)))
        if windowed:
            configs.append((f"jacobi_k128_clamp{int(clamp)}_windowed",
                            base + ["DECODER.layer1_windowed_sampling"
                                    "=true"]))
    if windowed:
        for topk in (None, 128):
            name = (f"jacobi_{'dense' if topk is None else f'k{topk}'}"
                    "_windowed")
            ov = ["DECODER.triangulation_method=jacobi",
                  "DECODER.layer1_windowed_sampling=true"]
            if topk is not None:
                ov.append(f"DECODER.inference_topk_queries={topk}")
            configs.append((name, ov))
    rows = []
    for name, ov in configs:
        # unique pred-file name per config so the cache can't cross-talk
        row = eval_config(name, ov, ckpt)
        if row:
            rows.append(row)

    print("\n| config | AP25 | AP50 | AP100 | AP150 | MPJPE | "
          "recall@500 |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['ap25']:.4f} | {r['ap50']:.4f} | "
              f"{r['ap100']:.4f} | {(r.get('ap150') or 0.0):.4f} | "
              f"{r['mpjpe']:.2f} | {r['recall500']:.4f} |")


def spread(steps=(59, 79, 99), ckpt_root=None, tag=""):
    """Multi-checkpoint noise-band measurement (VERDICT r4 item 3).

    The committed table is one checkpoint (epoch 99) of one seed; three
    shipping defaults were flipped on margins quoted against an INFERRED
    ±4 mm band. This evaluates the contested configs — k128 (baseline
    anchor), k64 (the −11.5 mm flip), k64_ptop4 (the headline) — at the
    three retained late-training checkpoints so the band is MEASURED
    spread across epochs, not inferred from near-identical-semantics
    rows. Each row is a compile-cache hit (~1-2 min). Results append to
    perf/ap_ablation_spread.jsonl with an `epoch` field; PERF.md renders
    the band and re-applies the headline rule against it.
    """
    global RESULTS
    RESULTS = os.path.join(PERF_DIR, "ap_ablation_spread.jsonl")
    ckpt = find_checkpoint(ckpt_root)
    print("checkpoint dir:", ckpt, "steps:", steps, flush=True)
    configs = [
        ("jacobi_k128", ["DECODER.triangulation_method=jacobi",
                         "DECODER.inference_topk_queries=128"]),
        ("jacobi_k64", ["DECODER.triangulation_method=jacobi",
                        "DECODER.inference_topk_queries=64"]),
        ("jacobi_k64_ptop4", ["DECODER.triangulation_method=jacobi",
                              "DECODER.inference_topk_queries=64",
                              "DECODER.inference_point_topm=4"]),
    ]
    tag = tag.rstrip("_") or "seed0"
    for step in steps:
        for name, ov in configs:
            eval_config(f"{tag}_{name}", ov, ckpt, step=step,
                        extra_fields={"epoch": int(step),
                                      "seed_tag": tag})


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    os.makedirs(PERF_DIR, exist_ok=True)
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode not in ("train", "eval", "all", "train_solver", "spread"):
        sys.exit(f"unknown mode {mode!r}; expected "
                 "train|eval|all|train_solver|spread")
    if mode in ("train", "all"):
        train()
    if mode in ("eval", "all"):
        evaluate()
    if mode == "spread":
        kw = {}
        rest = sys.argv[2:]
        if rest and os.path.isdir(rest[0]):
            kw["ckpt_root"] = rest[0]
            rest = rest[1:]
        # tag=seed1_ labels the rows (seed_tag field); bare ints are steps
        for a in rest:
            if a.startswith("tag="):
                kw["tag"] = a.split("=", 1)[1]
        steps = tuple(int(s) for s in rest if "=" not in s)
        if steps:
            kw["steps"] = steps
        spread(**kw)
    if mode == "train_solver":
        rest = [a for a in sys.argv[2:] if not a.startswith("-")]
        # KEY.SUB=value args are config overrides (e.g. a shorter
        # TRAIN.END_EPOCH for time-boxed comparisons); bare names are
        # solvers
        train_solver(tuple(a for a in rest if "=" not in a) or ("eigh",),
                     overrides=tuple(a for a in rest if "=" in a))
