"""The sorted-window gather composition's OVERHEAD ledger (VERDICT r4
item 1, companion to probe_sorted_gather_parts.py).

probe_real_index_spans.py (trained-checkpoint indices, committed) says
only SAMPLE-sorted order has one-hot-viable windows at dense layer 1
(lvl0 BS=512 spans p95=712, esc@W1024 1.3%; query-sorted p50=3510 —
the learned offsets span ~1450 rows per query, so keeping a query's P
samples contiguous forfeits the window). Sample-sorting forces two
structural overheads the core kernel never pays:

  A. the sort prologue: sort_key_val over each (view*head, level)'s
     S=61440 sample rows — batched (40, S) and unstacked forms
  B. the output UNSORT: a permutation gather of the (S, D=32) sorted
     per-sample results back to query order — batched vs unstacked,
     bf16 vs f32 (operand 3.9 vs 7.9 MB per pair straddles the gather
     cost cliff)
  C. the weight permute: (S, 4) f32 rows by sorted order
  D. invperm build: scatter iota vs second sort

The one-hot core itself measures ~W*128*2/197e12 ns/row (probe_sorted_
gather_parts step 3). GO/NO-GO: sum(A..D) + core + DMA must beat the
measured 40.4 ms dense-L1 sampler (profile_stages5) to justify
integration; each row here names the form so a loss is attributable.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/probes/probe_sorted_overheads.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

ITERS = 20
NH = 40           # view*head pairs
LQ = 15360
P = 4
S = LQ * P        # per-level samples per pair (61440)
D = 32


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
    print(f"{name:58s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    idx = jax.random.randint(k1, (NH, S), 0, 31460, dtype=jnp.int32)
    iota = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                            (NH, S))
    vals_bf = jax.random.normal(k2, (NH, S, D), jnp.bfloat16)
    vals_f32 = vals_bf.astype(jnp.float32)
    w4 = jax.random.normal(k3, (NH, S, 4), jnp.float32)
    perm = jax.vmap(lambda i: jax.random.permutation(
        jax.random.PRNGKey(1), S))(jnp.arange(NH)).astype(jnp.int32)

    # --- A. sort prologue (x3 levels in production)
    chained("A1 sort_key_val batched (40,61440)",
            lambda i, s: jax.lax.sort_key_val(i, s, dimension=-1),
            idx, iota)

    def unstacked_sort(i, s):
        outs = [jax.lax.sort_key_val(i[p], s[p], dimension=-1)[1]
                for p in range(NH)]
        return jnp.stack(outs)

    chained("A2 sort_key_val unstacked 40x(61440)", unstacked_sort,
            idx, iota)

    # --- B. unsort permutation gather of (S, D) results
    chained("B1 unsort batched take_along (40,61440,32) bf16",
            lambda v, p: jnp.take_along_axis(v, p[..., None], axis=1),
            vals_bf, perm)
    chained("B2 unsort batched take_along (40,61440,32) f32",
            lambda v, p: jnp.take_along_axis(v, p[..., None], axis=1),
            vals_f32, perm)

    def unstacked_unsort(v, p):
        return jnp.stack([v[i][p[i]] for i in range(NH)])

    chained("B3 unsort unstacked 40x(61440,32) bf16", unstacked_unsort,
            vals_bf, perm)

    # --- C. weight permute (S, 4) f32
    chained("C1 w4 permute batched (40,61440,4) f32",
            lambda w, p: jnp.take_along_axis(w, p[..., None], axis=1),
            w4, perm)

    # --- D. inverse permutation build
    chained("D1 invperm scatter .at[perm].set(iota) batched",
            lambda p, s: jnp.zeros_like(p).at[p].set(
                s, unique_indices=True) if p.ndim == 1 else
            jax.vmap(lambda pp, ss: jnp.zeros_like(pp).at[pp].set(
                ss, unique_indices=True))(p, s), perm, iota)
    chained("D2 invperm second sort_key_val batched",
            lambda p, s: jax.lax.sort_key_val(p, s, dimension=-1),
            perm, iota)

    # --- E. escape compaction: cumsum positions + bounded scatter of
    # escaped sample ids into a static E_cap buffer (exactness repair:
    # ~1.3% of samples escape W=1024 windows, probe_real_index_spans)
    E_CAP = 4096

    def compact(e_f32, sidx):
        esc = e_f32 > 0.987  # ~1.3%
        pos = jnp.cumsum(esc.astype(jnp.int32), axis=-1) - 1
        pos = jnp.where(esc, jnp.minimum(pos, E_CAP - 1), E_CAP)

        def one(p, s):
            buf = jnp.full((E_CAP + 1,), 0, jnp.int32)
            return buf.at[p].set(s, mode="drop")[:E_CAP]

        return jax.vmap(one)(pos, sidx)

    e_f32 = jax.random.uniform(k1, (NH, S), jnp.float32)
    chained("E1 escape compaction cumsum+scatter (40,61440)->4096",
            compact, e_f32, idx)

    # --- reference: the XLA gather this all must beat, same shapes
    tbl = jax.random.normal(rng, (31460, 128), jnp.bfloat16)
    chained("R1 plain gather 1 pair (61440 rows from 7.7MB)",
            lambda t, i: t[i], tbl, idx[0])

    def unstacked_gather(t, i):
        return jnp.stack([t[i[p]] for p in range(NH)])

    chained("R2 plain gather unstacked 40 pairs", unstacked_gather,
            tbl, idx)


if __name__ == "__main__":
    main()
