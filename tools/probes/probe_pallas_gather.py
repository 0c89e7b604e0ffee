"""Probe: Mosaic/Pallas vectorized dynamic gather from a VMEM table.

Round-1 found XLA's TPU gather costs ~5-20 ns/slice and a Pallas scalar
fori_loop gather 565 ns/slice. This probes whether Mosaic's vector gather
path (jnp.take lowered inside a kernel) can beat the XLA engine.

All timings use a 100-deep chained scan (one readback), and a `null`
variant measures the chain floor to subtract.

Usage: python output/probe_pallas_gather.py [variant ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 30720          # samples per (view*head) at compacted layer shape
BLK = 2048         # samples per grid step
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


def make_take_kernel(rows, dtype, equal_shape=False):
    def kern(idx_ref, tbl_ref, out_ref):
        idx = idx_ref[0].reshape(BLK)  # (8, BLK//8) -> (BLK,)
        if equal_shape:
            # Mosaic's dynamic_gather wants indices shaped like the input:
            # out[i, j] = tbl[idx2[i, j], j] with idx2 = broadcast rows
            idx2 = jnp.broadcast_to(idx[:, None], (BLK, 128))
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx2, axis=0)
        else:
            out_ref[:] = jnp.take(tbl_ref[:], idx, axis=0)

    def call(idx, tbl):
        idx3 = idx.reshape(S // BLK, 8, BLK // 8)
        return pl.pallas_call(
            kern,
            grid=(S // BLK,),
            in_specs=[
                pl.BlockSpec((1, 8, BLK // 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, 128), dtype),
        )(idx3, tbl)

    return call


def make_onehot_kernel(rows, dtype):
    def kern(idx_ref, tbl_ref, out_ref):
        idx = idx_ref[0].reshape(BLK)
        oh = jax.nn.one_hot(idx, rows, dtype=dtype)
        out_ref[:] = jnp.dot(oh, tbl_ref[:],
                             preferred_element_type=jnp.float32
                             ).astype(dtype)

    def call(idx, tbl):
        idx3 = idx.reshape(S // BLK, 8, BLK // 8)
        return pl.pallas_call(
            kern,
            grid=(S // BLK,),
            in_specs=[
                pl.BlockSpec((1, 8, BLK // 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, 128), dtype),
        )(idx3, tbl)

    return call


def xla_gather(idx, tbl):
    sub = jax.lax.optimization_barrier(tbl)
    return sub[idx]


def main(selected):
    key = jax.random.PRNGKey(0)
    variants = {}

    def null_fn(eps):
        return eps[None] + 1.0

    variants["null"] = (lambda: chained(lambda e: null_fn(e)),)

    def add(name, maker, rows, dtype):
        tbl = jax.random.normal(key, (rows, 128), dtype)
        idx = jax.random.randint(key, (S,), 0, rows, jnp.int32)

        def run(fn=maker, idx=idx, tbl=tbl, rows=rows):
            def wrapped(eps, tbl_):
                # float add is not constant-foldable -> the gather operand
                # changes every scan iteration, so nothing hoists
                t = tbl_ + eps.astype(tbl_.dtype)
                return fn(idx, t).astype(jnp.float32)
            return chained(wrapped, tbl)

        variants[name] = (run,)

    for rows, tag in ((2048, "small"), (31488, "big")):
        for dtype, dtag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            if rows * 128 * dtype.dtype.itemsize <= 12 * 2 ** 20:
                add(f"take_{tag}_{dtag}", make_take_kernel(rows, dtype),
                    rows, dtype)
            add(f"xla_{tag}_{dtag}", xla_gather, rows, dtype)
            if rows == 2048:
                add(f"onehot_{tag}_{dtag}",
                    make_onehot_kernel(rows, dtype), rows, dtype)
                add(f"take_eq_{tag}_{dtag}",
                    make_take_kernel(rows, dtype, equal_shape=True),
                    rows, dtype)

    for name in (selected or list(variants)):
        if name not in variants:
            print(f"unknown variant {name}")
            continue
        try:
            dt = variants[name][0]()
            print(f"{name:24s} {dt*1e3:8.3f} ms  "
                  f"{dt/S*1e9:7.2f} ns/row", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"{name:24s} FAILED: {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
