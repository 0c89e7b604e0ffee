"""GO/NO-GO ledger for the sorted-window one-hot MXU gather
(ops/onehot_gather.py, VERDICT r4 item 1) at EXACT flagship dense-L1
shapes, on the real TPU.

PERF.md "where the time goes at the round-5 headline" puts the dense
layer-1 sampler at 40.4 ms/frame (P=4, Lq=15360) — 1.8x off the 3.06
ns/row XLA gather floor, the single biggest single-chip prize left.
probe_real_index_spans.py established sample-sorted viability on
trained-checkpoint indices (BS=512 spans p95=712, 1.3% escapes at
W=1024); probe_sorted_gather_parts.py validated the one-hot core's MXU
cost model. This probe answers the composed question: the PRODUCTION
sampler (deform_sample_corner) with MVG_SAMPLER_IMPL=onehot vs the
default XLA gather, same inputs, chained-scan timing (the relay traps
in PERF.md).

Index realism: timings of both paths are data-independent (static
shapes; the escape repair is a fixed E_CAP gather and the lax.cond
picks the branch per input). Two location sets are probed anyway:
uniform (even density — escape-free) and clustered (queries cluster
around a few people as in real scenes; verifies the cond stays on the
sorted path when escapes are nonzero). MVG_ONEHOT_DEBUG=1 prints the
max per-pair escape count so the branch taken is recorded, not assumed.

Run SOLO on the TPU (Mosaic faults can wedge the worker):
    PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 1800 python tools/probes/probe_onehot_ledger.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

ITERS = 20


def chained_time(name, make_fn, primary, *rest, iters=ITERS):
    @jax.jit
    def run(primary, *rest):
        def body(eps, _):
            out = make_fn(primary + eps.astype(primary.dtype), *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf).astype(jnp.float32) * 0.0, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return eps

    float(run(primary, *rest))
    t = time.perf_counter()
    float(run(primary, *rest))
    dt = (time.perf_counter() - t) / iters
    print(f"{name:58s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def clustered_locations(rng, N, Lq, H, L, P, n_clusters=4):
    """Queries concentrate around a few image regions (people), with
    per-point offsets matching the measured per-query row spread
    (~6-14 y-rows at lvl0, probe_real_index_spans)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    centers = jax.random.uniform(k1, (N, n_clusters, 2),
                                 minval=0.15, maxval=0.85)
    assign = jax.random.randint(k2, (N, Lq), 0, n_clusters)
    q_centers = jnp.take_along_axis(
        centers, assign[..., None].repeat(2, -1), axis=1)  # (N, Lq, 2)
    jitter = jax.random.normal(k3, (N, Lq, H, L, P, 2)) * 0.05
    loc = q_centers[:, :, None, None, None, :] + jitter
    return jnp.clip(loc, 0.0, 0.999)


def main():
    from mvgformer_tpu.ops import sampling as S

    rng = jax.random.PRNGKey(0)
    N, H, D = 5, 8, 32
    SHAPES = ((128, 240), (64, 120), (32, 60))
    total_hw = sum(h * w for h, w in SHAPES)
    value = jax.random.normal(rng, (N, total_hw, H, D), jnp.bfloat16)

    dummy = jnp.zeros((4,), jnp.float32)
    chained_time("null (relay floor per iter)", lambda d: d + 1.0, dummy)

    results = {}
    for P in (4,):
        for tag, loc in (
            ("uniform", jax.random.uniform(
                rng, (N, 15360, H, 3, P, 2))),
            ("clustered", clustered_locations(
                jax.random.PRNGKey(7), N, 15360, H, 3, P)),
        ):
            aw = jax.random.uniform(rng, (N, 15360, H, 3, P),
                                    jnp.bfloat16)
            for impl in ("", "onehot"):
                os.environ["MVG_SAMPLER_IMPL"] = impl
                # NOTE: MVG_ONEHOT_DEBUG uses jax.debug.print, which the
                # axon TPU relay rejects (no host callbacks) — branch
                # verification for these exact inputs runs on CPU via
                # probe_onehot_branch.py instead
                label = impl or "xla"
                name = f"dense-L1 P={P} {tag} impl={label}"
                results[(tag, label)] = chained_time(
                    name,
                    lambda v, l, a: S.deform_sample_corner(
                        v, SHAPES, l, a),
                    value, loc, aw)
    os.environ.pop("MVG_SAMPLER_IMPL", None)
    os.environ.pop("MVG_ONEHOT_DEBUG", None)

    for tag in ("uniform", "clustered"):
        x, o = results[(tag, "xla")], results[(tag, "onehot")]
        print(f"{tag}: xla {x*1e3:.2f} ms vs onehot {o*1e3:.2f} ms "
              f"-> {'GO' if o < x else 'NO-GO'} ({x/o:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
