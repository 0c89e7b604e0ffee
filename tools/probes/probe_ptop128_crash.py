"""Minimal repro hunt for the topk128_ptop4 TPU-worker kernel fault
(VERDICT r4 item 2 / weak #3).

Full-model bisection (bench_detail solo runs, 2026-08-19): the config
crashes the worker at MVG_GATHER_CAP_MB=16 (the P<=4 default: all 3
levels in ONE 10.7 MB corner table, one gather per (view,head)) and
runs clean at CAP=8 (9.125 fps). The headline config k64_ptop4 shares
the 16 MB path at half the rows (11520/gather) and has never faulted.

This probe runs ONLY deform_sample_corner at the crashing shape
(N=5, H=8, Lq=1920, P=4, CAP=16) to separate "the gather program
itself" from "the gather inside the full-model program". Run each
case in its own process (a worker crash poisons the process):

    python tools/probes/probe_ptop128_crash.py lq1920_cap16   # crash?
    python tools/probes/probe_ptop128_crash.py lq960_cap16    # headline
    python tools/probes/probe_ptop128_crash.py lq1920_cap8    # control
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

CASES = {
    "lq1920_cap16": (1920, 16),
    "lq960_cap16": (960, 16),
    "lq1920_cap8": (1920, 8),
    # dense layer-1 shape at ptop4 also uses CAP=16 in the crashing
    # config; included so the repro can tell which layer faults
    "lq15360_cap16": (15360, 16),
}


def main(case):
    lq, cap = CASES[case]
    os.environ["MVG_GATHER_CAP_MB"] = str(cap)

    import jax
    import jax.numpy as jnp

    from mvgformer_tpu.ops.sampling import deform_sample_corner

    N, H, D, P = 5, 8, 32, 4
    SHAPES = ((128, 240), (64, 120), (32, 60))
    total_hw = sum(h * w for h, w in SHAPES)
    rng = jax.random.PRNGKey(0)
    value = jax.random.normal(rng, (N, total_hw, H, D), jnp.bfloat16)
    loc = jax.random.uniform(rng, (N, lq, H, 3, P, 2))
    aw = jax.random.uniform(rng, (N, lq, H, 3, P), jnp.bfloat16)

    @jax.jit
    def run(value, loc, aw):
        def body(eps, _):
            out = deform_sample_corner(value + eps.astype(value.dtype),
                                       SHAPES, loc, aw)
            return jnp.sum(out).astype(jnp.float32) * 0.0, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=20)
        return eps

    float(run(value, loc, aw))
    t = time.perf_counter()
    float(run(value, loc, aw))
    dt = (time.perf_counter() - t) / 20 * 1e3
    print(f"{case}: OK  {dt:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
