"""Probe round 2: honest idx dependence + Mosaic kernel isolation.

- idx depends on the carried eps through a float comparison (not
  algebraically removable), so neither the gather nor its indices hoist.
- Pallas kernels get pre-broadcast 2D indices (no in-kernel reshape).

Usage: python output/probe_pallas_gather2.py [variant ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 30720
BLK = 2048
ITERS = 100


def chained(fn, *args):
    @jax.jit
    def run(*a):
        def body(eps, _):
            out = fn(eps, *a)
            return jnp.sum(out).astype(jnp.float32) * 0.0, None
        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return eps
    float(run(*args))
    t = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t) / ITERS


def perturb_idx(idx, eps, rows):
    # (eps > 1e30) is always False at runtime but not foldable at compile
    bump = (eps > 1e30).astype(jnp.int32)
    return jnp.clip(idx + bump, 0, rows - 1)


# ---------------- pallas kernels ----------------

def trivial_kernel(rows, dtype):
    def kern(tbl_ref, out_ref):
        out_ref[:] = tbl_ref[:] * 2.0

    def call(idx2d, tbl):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl)

    return call


def take_eq_kernel(rows, dtype):
    """Equal-shape take_along_axis: idx2d prebuilt (S, 128) int32."""

    def kern(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

    def call(idx2d, tbl):
        return pl.pallas_call(
            kern,
            grid=(S // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, 128), dtype),
        )(idx2d, tbl)

    return call


def onehot_kernel(rows, dtype):
    """One-hot matmul gather: idx as (S, 128) broadcast, use col 0."""

    def kern(idx_ref, tbl_ref, out_ref):
        idx = idx_ref[:, 0:1]  # (BLK, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, rows), 1)
        oh = (cols == idx).astype(dtype)
        out_ref[:] = jnp.dot(oh, tbl_ref[:],
                             preferred_element_type=jnp.float32
                             ).astype(dtype)

    def call(idx2d, tbl):
        return pl.pallas_call(
            kern,
            grid=(S // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, 128), dtype),
        )(idx2d, tbl)

    return call


def xla_gather(idx2d, tbl):
    sub = jax.lax.optimization_barrier(tbl)
    return sub[idx2d[:, 0]]


def main(selected):
    key = jax.random.PRNGKey(0)
    variants = {"null": lambda: chained(lambda e: e[None] + 1.0)}

    def add(name, maker, rows, dtype):
        tbl = jax.random.normal(key, (rows, 128), dtype)
        idx = jax.random.randint(key, (S,), 0, rows, jnp.int32)
        idx2d = jnp.broadcast_to(idx[:, None], (S, 128))

        def run(fn=maker, idx2d=idx2d, tbl=tbl, rows=rows):
            def wrapped(eps, tbl_):
                ii = perturb_idx(idx2d, eps, rows)
                return fn(ii, tbl_).astype(jnp.float32)
            return chained(wrapped, tbl)

        variants[name] = run

    for dtype, dtag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        add(f"trivial_{dtag}", trivial_kernel(2048, dtype), 2048, dtype)
        add(f"take_eq_{dtag}", take_eq_kernel(2048, dtype), 2048, dtype)
        add(f"onehot_{dtag}", onehot_kernel(2048, dtype), 2048, dtype)
        add(f"xla_small_{dtag}", xla_gather, 2048, dtype)
        add(f"xla_big_{dtag}", xla_gather, 31488, dtype)

    for name in (selected or list(variants)):
        if name not in variants:
            print(f"unknown variant {name}")
            continue
        try:
            dt = variants[name]()
            print(f"{name:20s} {dt*1e3:8.3f} ms  {dt/S*1e9:7.2f} ns/row",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"{name:20s} FAILED: {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
