"""Does a gather from INPUT tables run the fast (VMEM-staged) path even
when the tables differ per dispatch (no scan-loop-invariant hoisting)?

T1: one jit program with 40 tables as inputs doing the grouped gathers
    (topk shapes); called 12x back-to-back cycling 3 pre-staged table
    sets; single block at the end. Compare per-call time vs the
    in-program E3 (~14.7 ms net) and scan-hoisted E1 (~4.4 ms net).
T2: same but called with the SAME table set every time (upper bound on
    any cross-dispatch caching).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/output")

import jax
import jax.numpy as jnp

from probe_grouped_parts import (GROUPS, Lq, N, H, D, P, builds, gathers,
                                 idx_prep, make_inputs)


def main():
    value, loc, aw = make_inputs()
    g_idx, g_wts, g_aw = jax.jit(idx_prep)(loc, aw)

    sets = []
    for s in range(3):
        v = value + jnp.bfloat16(s * 0.25)
        sets.append(jax.jit(builds)(v))
    jax.block_until_ready(jax.tree_util.tree_leaves(sets))

    gather_fn = jax.jit(gathers)
    # warmup/compile
    out = gather_fn(sets[0], g_idx, g_wts, g_aw)
    float(jnp.sum(out))

    M = 12
    for name, pick in (("T1 cycling tables", lambda i: sets[i % 3]),
                       ("T2 same tables", lambda i: sets[0])):
        acc = None
        t = time.perf_counter()
        outs = [gather_fn(pick(i), g_idx, g_wts, g_aw) for i in range(M)]
        s = float(sum(jnp.sum(o) for o in outs))  # one readback-ish
        dt = (time.perf_counter() - t) / M
        print(f"{name:20s} {dt*1e3:8.3f} ms/call (incl dispatch; "
              f"relay amortized /{M})", flush=True)


if __name__ == "__main__":
    main()
