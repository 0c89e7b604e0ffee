"""Bisect the corner-table build kernel's real-TPU Mosaic failure.

ops/table_pallas.py passes interpret mode but HTTP-500s the remote
tpu_compile_helper inside the full model. Each form below is one
candidate lowering; run them one at a time (a 500 wedges the TPU
worker ~1 min, so failures sleep):

    python tools/probes/probe_table_kernel_forms.py a   # shipped form
    python tools/probes/probe_table_kernel_forms.py b   # concat store
    python tools/probes/probe_table_kernel_forms.py c   # small toy a
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NH, D = 40, 32


def form_a(h, w, dtype=jnp.bfloat16):
    """The shipped kernel: partial slice stores at sublane/lane offsets."""
    from mvgformer_tpu.ops.table_pallas import build_corner_table_level

    v = jax.random.normal(jax.random.PRNGKey(0), (NH, h, w, D), dtype)
    out = jax.jit(lambda v: build_corner_table_level(v, h, w))(v)
    out.block_until_ready()
    return out


def form_b(h, w, dtype=jnp.bfloat16):
    """Concat formulation: build the whole block in registers (pads via
    concat with zeros along the x axis, corners concat along lanes),
    one full-block store — no partial stores."""
    hp = h + 2
    wpp = ((w + 2 + 15) // 16) * 16
    by = None
    for cand in range(16, 0, -1):
        if hp % cand == 0:
            by = cand
            break

    def kernel(vp_hbm, out_ref, vbuf, sem):
        p = pl.program_id(0)
        t = pl.program_id(1)
        dma = pltpu.make_async_copy(
            vp_hbm.at[p, pl.ds(t * by, by + 1)], vbuf, sem)
        dma.start()
        dma.wait()
        cur = vbuf[0:by]
        nxt = vbuf[1:by + 1]
        z1 = jnp.zeros((by, 1, D), cur.dtype)
        zr0 = jnp.zeros((by, wpp - w - 1, D), cur.dtype)
        zr1 = jnp.zeros((by, wpp - w, D), cur.dtype)
        c00 = jnp.concatenate([z1, cur, zr0], axis=1)
        c01 = jnp.concatenate([cur, zr1], axis=1)
        c10 = jnp.concatenate([z1, nxt, zr0], axis=1)
        c11 = jnp.concatenate([nxt, zr1], axis=1)
        out_ref[0] = jnp.concatenate([c00, c01, c10, c11], axis=-1)

    v = jax.random.normal(jax.random.PRNGKey(0), (NH, h, w, D), dtype)
    vp = jnp.pad(v, ((0, 0), (1, 2), (0, 0), (0, 0)))
    out = jax.jit(lambda vp: pl.pallas_call(
        kernel,
        grid=(NH, hp // by),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, by, wpp, 4 * D),
                               lambda p, t: (p, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NH, hp, wpp, 4 * D), v.dtype),
        scratch_shapes=[pltpu.VMEM((by + 1, w, D), v.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )(vp))(vp)
    out.block_until_ready()
    return out


def form_c(h, w, dtype=jnp.bfloat16):
    """Mimic the PROVEN window_dma lowering: PrefetchScalarGridSpec,
    pltpu.MemorySpace.ANY input, <=3-D blocks, full-block concat store,
    per-block (pair, y0) origins prefetched."""
    hp = h + 2
    wpp = ((w + 2 + 15) // 16) * 16
    by = None
    for cand in range(16, 0, -1):
        if hp % cand == 0:
            by = cand
            break
    tpp = hp // by

    def kernel(og_ref, vp_ref, out_ref, vbuf, sem):
        b = pl.program_id(0)
        p = og_ref[b, 0]
        y0 = og_ref[b, 1]
        dma = pltpu.make_async_copy(
            vp_ref.at[p, pl.ds(y0, by + 1)], vbuf, sem)
        dma.start()
        dma.wait()
        cur = vbuf[0:by]
        nxt = vbuf[1:by + 1]
        z1 = jnp.zeros((by, 1, D), cur.dtype)
        zr0 = jnp.zeros((by, wpp - w - 1, D), cur.dtype)
        zr1 = jnp.zeros((by, wpp - w, D), cur.dtype)
        c00 = jnp.concatenate([z1, cur, zr0], axis=1)
        c01 = jnp.concatenate([cur, zr1], axis=1)
        c10 = jnp.concatenate([z1, nxt, zr0], axis=1)
        c11 = jnp.concatenate([nxt, zr1], axis=1)
        out_ref[:] = jnp.concatenate([c00, c01, c10, c11], axis=-1)

    v = jax.random.normal(jax.random.PRNGKey(0), (NH, h, w, D), dtype)
    vp = jnp.pad(v, ((0, 0), (1, 2), (0, 0), (0, 0)))
    og = jnp.stack(jnp.meshgrid(jnp.arange(NH, dtype=jnp.int32),
                                jnp.arange(tpp, dtype=jnp.int32) * by,
                                indexing="ij"),
                   axis=-1).reshape(NH * tpp, 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NH * tpp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((by, wpp, 4 * D), lambda b, og: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((by + 1, w, D), dtype),
                        pltpu.SemaphoreType.DMA],
    )
    out = jax.jit(lambda og, vp: pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NH * hp, wpp, 4 * D), dtype),
    )(og, vp))(og, vp)
    out.block_until_ready()

    # correctness vs the XLA build
    from mvgformer_tpu.ops.sampling import build_corner_tables

    ref = build_corner_tables(v.reshape(NH, h * w, 1, D), ((h, w),))[0]
    ref = jnp.asarray(ref).reshape(NH, hp, w + 2, 4 * D)
    got = out.reshape(NH, hp, wpp, 4 * D)[:, :, :w + 2]
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"  form_c max abs err vs XLA build: {err}", flush=True)
    return out


def form_d(h, w, variant, dtype=jnp.bfloat16):
    """Micro-bisection of form c: d0 = DMA + plain copy store only;
    d1 = + lane-offset partial stores; d2 = + x(sublane)-offset store;
    d3 = lane concat only; d4 = x-pad concat only."""
    hp = h + 2
    wpp = ((w + 2 + 15) // 16) * 16
    by = None
    for cand in range(16, 0, -1):
        if hp % cand == 0:
            by = cand
            break
    tpp = hp // by

    def kernel(og_ref, vp_ref, out_ref, vbuf, sem):
        b = pl.program_id(0)
        p = og_ref[b, 0]
        y0 = og_ref[b, 1]
        dma = pltpu.make_async_copy(
            vp_ref.at[p, pl.ds(y0, by + 1), :, :], vbuf, sem)
        dma.start()
        dma.wait()
        cur = vbuf[0:by]
        nxt = vbuf[1:by + 1]
        if variant == 0:      # plain store, no offsets
            out_ref[:] = jnp.concatenate(
                [jnp.zeros((by, wpp - w, 4 * D), cur.dtype),
                 jnp.zeros((by, w, 4 * D), cur.dtype)], axis=1) * 0
            out_ref[:, 0:w, 0:D] = cur
        elif variant == 1:    # lane-offset partial stores
            out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:, 0:w, 0:D] = cur
            out_ref[:, 0:w, D:2 * D] = cur
            out_ref[:, 0:w, 2 * D:3 * D] = nxt
            out_ref[:, 0:w, 3 * D:4 * D] = nxt
        elif variant == 2:    # + x(sublane)-offset stores
            out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:, 1:w + 1, 0:D] = cur
            out_ref[:, 0:w, D:2 * D] = cur
            out_ref[:, 1:w + 1, 2 * D:3 * D] = nxt
            out_ref[:, 0:w, 3 * D:4 * D] = nxt
        elif variant == 3:    # lane concat only
            blk = jnp.concatenate([cur, cur, nxt, nxt], axis=-1)
            out_ref[:, 0:w, :] = blk
        elif variant == 4:    # x-pad concat only
            z1 = jnp.zeros((by, 1, D), cur.dtype)
            zr0 = jnp.zeros((by, wpp - w - 1, D), cur.dtype)
            c00 = jnp.concatenate([z1, cur, zr0], axis=1)
            out_ref[:, :, 0:D] = c00
            out_ref[:, :, D:2 * D] = c00
            out_ref[:, :, 2 * D:3 * D] = c00
            out_ref[:, :, 3 * D:4 * D] = c00

    v = jax.random.normal(jax.random.PRNGKey(0), (NH, h, w, D), dtype)
    vp = jnp.pad(v, ((0, 0), (1, 2), (0, 0), (0, 0)))
    og = jnp.stack(jnp.meshgrid(jnp.arange(NH, dtype=jnp.int32),
                                jnp.arange(tpp, dtype=jnp.int32) * by,
                                indexing="ij"),
                   axis=-1).reshape(NH * tpp, 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NH * tpp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((by, wpp, 4 * D), lambda b, og: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((by + 1, w, D), dtype),
                        pltpu.SemaphoreType.DMA],
    )
    out = jax.jit(lambda og, vp: pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NH * hp, wpp, 4 * D), dtype),
    )(og, vp))(og, vp)
    out.block_until_ready()
    return out


def form_e(h, w, dtype=jnp.bfloat16):
    """No manual DMA at all: the block pipeline fetches one v row per
    grid step through TWO block-spec views of the same padded input
    (offset by one row), kernel is pure register concat + one store.
    Suspect for the d0-d4 failures: manual DMA with a 32-element
    (sub-lane-width) minormost dim; block-spec fetches may relayout."""
    hp = h + 2
    wpp = ((w + 2 + 15) // 16) * 16

    def kernel(cur_ref, nxt_ref, out_ref):
        cur = cur_ref[0, 0]   # (w, D)
        nxt = nxt_ref[0, 0]
        z1 = jnp.zeros((1, D), cur.dtype)
        zr0 = jnp.zeros((wpp - w - 1, D), cur.dtype)
        zr1 = jnp.zeros((wpp - w, D), cur.dtype)
        c00 = jnp.concatenate([z1, cur, zr0], axis=0)
        c01 = jnp.concatenate([cur, zr1], axis=0)
        c10 = jnp.concatenate([z1, nxt, zr0], axis=0)
        c11 = jnp.concatenate([nxt, zr1], axis=0)
        out_ref[0, 0] = jnp.concatenate([c00, c01, c10, c11], axis=-1)

    v = jax.random.normal(jax.random.PRNGKey(0), (NH, h, w, D), dtype)
    vp = jnp.pad(v, ((0, 0), (1, 2), (0, 0), (0, 0)))
    out = jax.jit(lambda vp: pl.pallas_call(
        kernel,
        grid=(NH, hp),
        in_specs=[
            pl.BlockSpec((1, 1, w, D), lambda p, y: (p, y, 0, 0)),
            pl.BlockSpec((1, 1, w, D), lambda p, y: (p, y + 1, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, wpp, 4 * D),
                               lambda p, y: (p, y, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NH, hp, wpp, 4 * D), dtype),
    )(vp, vp))(vp)
    out.block_until_ready()

    from mvgformer_tpu.ops.sampling import build_corner_tables

    ref = build_corner_tables(v.reshape(NH, h * w, 1, D), ((h, w),))[0]
    ref = jnp.asarray(ref).reshape(NH, hp, w + 2, 4 * D)
    got = out[:, :, :w + 2]
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"  form_e max abs err vs XLA build: {err}", flush=True)
    return out


FORMS = {
    "a": lambda: form_a(128, 240),
    "a_small": lambda: form_a(16, 30),
    "b": lambda: form_b(128, 240),
    "b_small": lambda: form_b(16, 30),
    "c": lambda: form_c(128, 240),
    "c_small": lambda: form_c(16, 30),
    "d0": lambda: form_d(16, 30, 0),
    "d1": lambda: form_d(16, 30, 1),
    "d2": lambda: form_d(16, 30, 2),
    "d3": lambda: form_d(16, 30, 3),
    "d4": lambda: form_d(16, 30, 4),
    "e": lambda: form_e(128, 240),
    "e_small": lambda: form_e(16, 30),
}


def main(selected):
    for name in (selected or list(FORMS)):
        try:
            out = FORMS[name]()
            print(f"{name:10s} OK out={out.shape} "
                  f"sum={float(jnp.sum(out.astype(jnp.float32))):.2f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)
            time.sleep(65)


if __name__ == "__main__":
    main(sys.argv[1:])
