"""Try Mosaic/Pallas gather lowerings one at a time to find ANY form
that compiles on this toolchain. Each HTTP-500 wedges the TPU worker
~1 min, so run with sleeps between failures.

Usage: python output/probe_mosaic_gather_forms.py [form ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_form(name, kernel, inputs, out_shape, grid=None, in_specs=None,
             out_specs=None):
    try:
        # current pallas rejects in_specs/out_specs=None — pass only
        # what's set
        kw = {}
        if grid is not None:
            kw["grid"] = grid
        if in_specs is not None:
            kw["in_specs"] = in_specs
        if out_specs is not None:
            kw["out_specs"] = out_specs
        fn = pl.pallas_call(kernel, out_shape=out_shape, **kw)
        r = jax.jit(fn)(*inputs)
        r.block_until_ready()
        # correctness spot check where possible
        print(f"{name:36s} OK  out={r.shape} sum={float(jnp.sum(r)):.3f}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"{name:36s} FAIL {type(e).__name__}: {msg}", flush=True)
        time.sleep(45)
        return False


def main(selected):
    key = jax.random.PRNGKey(0)
    R, BLK = 2048, 512
    tbl_f32 = jax.random.normal(key, (R, 128), jnp.float32)
    idx = jax.random.randint(key, (BLK,), 0, R, jnp.int32)
    idx2d = jnp.broadcast_to(idx[:, None], (BLK, 128))
    idx_rows = idx.reshape(8, BLK // 8)

    forms = {}

    # F1: take_along_axis equal cols, idx (BLK,128) input, table (R,128)
    def k1(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

    forms["f1_take_along_2d"] = (k1, (idx2d, tbl_f32),
                                 jax.ShapeDtypeStruct((BLK, 128),
                                                      jnp.float32))

    # F2: jnp.take axis=0 with 1-D idx from SMEM-ish (8, BLK//8) reshape
    def k2(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:].reshape(BLK), axis=0)

    forms["f2_take_1d"] = (k2, (idx_rows, tbl_f32),
                           jax.ShapeDtypeStruct((BLK, 128), jnp.float32))

    # F3: lax.gather explicit, collapsed dim
    def k3(idx_ref, tbl_ref, out_ref):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        out_ref[:] = jax.lax.gather(
            tbl_ref[:], idx_ref[:].reshape(BLK)[:, None], dn,
            slice_sizes=(1, 128))

    forms["f3_lax_gather"] = (k3, (idx_rows, tbl_f32),
                              jax.ShapeDtypeStruct((BLK, 128), jnp.float32))

    # F4: within-sublane-group gather: take_along_axis on (8, 128) table
    tbl8 = jax.random.normal(key, (8, 128), jnp.float32)
    idx8 = jax.random.randint(key, (8, 128), 0, 8, jnp.int32)

    def k4(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

    forms["f4_take_along_8row"] = (k4, (idx8, tbl8),
                                   jax.ShapeDtypeStruct((8, 128),
                                                        jnp.float32))

    # F5: gather along LANES: (128, R_lanewise) table, idx per lane
    tblT = jax.random.normal(key, (128, 128), jnp.float32)
    idxT = jax.random.randint(key, (128, 128), 0, 128, jnp.int32)

    def k5(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)

    forms["f5_take_along_lanes"] = (k5, (idxT, tblT),
                                    jax.ShapeDtypeStruct((128, 128),
                                                         jnp.float32))

    # F6: dynamic_slice in unrolled loop of 8 (control, known-slow form)
    def k6(idx_ref, tbl_ref, out_ref):
        for i in range(8):
            out_ref[i, :] = tbl_ref[idx_ref[0, i], :]

    forms["f6_dynslice_unroll8"] = (
        k6, (idx_rows[:1, :8].reshape(1, 8), tbl_f32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32))

    for name in (selected or list(forms)):
        if name not in forms:
            print(f"unknown {name}")
            continue
        k, inp, osh = forms[name]
        run_form(name, k, inp, osh)


if __name__ == "__main__":
    main(sys.argv[1:])
