import os, sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20
NH, R, C = 40, 31460, 128
BS, W = 512, 1024
nblk = 120
S = nblk * BS

def chained(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(eps, _):
            out = fn(a[0] + eps.astype(a[0].dtype), *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf).astype(jnp.float32) * 0.0, None
        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return eps
    float(run(*args))
    t = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t) / ITERS * 1e3
    print(f"{name:55s} {dt:8.3f} ms", flush=True)
    return dt

rng = jax.random.PRNGKey(0)
tables = jax.random.normal(rng, (NH, R, C), jnp.bfloat16)
base8 = jax.random.randint(rng, (NH, nblk), 0, (R - W) // 8, jnp.int32)
local = jax.random.randint(rng, (NH, S), 0, W, jnp.int32)

from mvgformer_tpu.ops.onehot_gather import _onehot_select, deform_gather_reduce, _reference_reduce

# 1. the production kernel alone
chained("select: production kernel (DMA+onehot matmul)",
        lambda t: _onehot_select(t, base8, local[..., None]), tables)

# variants
def make_kernel(do_dma, do_mm):
    def _k(base_ref, local_ref, tbl_ref, out_ref, win, sem):
        pair = pl.program_id(0)
        blk = pl.program_id(1)
        if do_dma:
            dma = pltpu.make_async_copy(
                tbl_ref.at[pair, pl.ds(base_ref[pair, blk] * 8, W), :],
                win, sem)
            dma.start()
            dma.wait()
        if do_mm:
            l = local_ref[...].reshape(BS, 1)
            onehot = (l == jax.lax.broadcasted_iota(
                jnp.int32, (BS, W), 1)).astype(win.dtype)
            out_ref[...] = jnp.dot(onehot, win[...],
                preferred_element_type=jnp.float32).astype(out_ref.dtype)[None]
        else:
            out_ref[...] = win[:BS][None] * 1.0
    return _k

def run_variant(tables, kern):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NH, nblk),
        in_specs=[pl.BlockSpec((1, BS, 1), lambda p, b, base: (p, b, 0)),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, BS, C), lambda p, b, base: (p, b, 0)),
        scratch_shapes=[pltpu.VMEM((W, C), tables.dtype),
                        pltpu.SemaphoreType.DMA(())])
    return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((NH, S, C), tables.dtype),
                          grid_spec=grid_spec)(base8, local.reshape(NH, S, 1), tables)

chained("select: DMA only (copy win->out)",
        lambda t: run_variant(t, make_kernel(True, False)), tables)
chained("select: matmul only (no DMA, stale win)",
        lambda t: run_variant(t, make_kernel(False, True)), tables)
chained("select: neither (grid+block io only)",
        lambda t: run_variant(t, make_kernel(False, False)), tables)

# 2. full composition vs reference at same shapes
idx = jnp.clip(jax.lax.sort_key_val(
    jax.random.randint(rng, (NH, S), 0, R, jnp.int32),
    jnp.zeros((NH, S), jnp.int32))[0], 0, R - 1)
idx = jax.random.permutation(rng, idx, axis=1, independent=True)
w4 = jax.random.normal(rng, (NH, S, 4), jnp.float32)
chained("deform_gather_reduce (full onehot composition)",
        lambda t: deform_gather_reduce(t, idx, w4), tables)
chained("reference gather+reduce",
        lambda t: _reference_reduce(t, idx, w4), tables)
