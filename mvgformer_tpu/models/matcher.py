"""Set matching of queries to ground-truth people — dense, static-shape.

The reference matcher (/root/reference/lib/models/matcher.py:20-262) moves
the cost matrix to the CPU and runs scipy / python loops; the shipped
training configs use `match_method: KNN` with K=5
(configs/panoptic/knn5-lr4-q1024-g8.yaml:155-156), which is a pure top-k and
therefore stays on-device here. Hungarian remains available as a host-side
eval utility (scipy), used outside jit, matching the reference's eval-time
`hungarian` option.

Dense representation of `indices` (the reference's per-batch ragged
(query_ids, gt_ids) lists): a MatchResult with a fixed (B, M, K) query-index
tensor plus validity masks — every downstream loss consumes it with static
shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MatchResult(NamedTuple):
    # For each (batch, gt slot, k): the matched query index.
    query_idx: jnp.ndarray     # (B, M, K) int32
    # Valid gt slots (slot < num_person).
    gt_valid: jnp.ndarray      # (B, M) bool
    # Per-query positive mask: query matched to >= 1 valid gt.
    query_mask: jnp.ndarray    # (B, Q) bool
    # Per-(gt, k) pair validity. KNN fills all K slots per valid gt;
    # threshold ('multiple') matching fills a VARIABLE number, and the
    # losses must not weight the unfilled slots (their query_idx values
    # are top_k tie-break garbage). None means "all K slots of a valid
    # gt are real" (KNN / hungarian K=1).
    pair_valid: jnp.ndarray = None  # (B, M, K) bool or None


def pose_l1_cost(pred_abs: jnp.ndarray, gt_abs: jnp.ndarray,
                 scale: float = 0.01) -> jnp.ndarray:
    """0.01 * L1 distance of flattened (J*3) poses (matcher.py:164-169).

    pred_abs: (B, Q, J, 3); gt_abs: (B, M, J, 3) -> (B, Q, M).
    """
    diff = jnp.abs(pred_abs[:, :, None] - gt_abs[:, None])  # (B, Q, M, J, 3)
    return scale * jnp.sum(diff, axis=(-1, -2))


def focal_class_cost(prob: jnp.ndarray, alpha: float = 0.25,
                     gamma: float = 2.0) -> jnp.ndarray:
    """Per-query focal classification cost for the positive class
    (matcher.py:150-162). prob: (B, Q) positive-class probability ->
    (B, Q) cost (same for every gt)."""
    neg = (1 - alpha) * (prob ** gamma) * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    return pos - neg


def knn_match(cost: jnp.ndarray, num_person: jnp.ndarray,
              k: int) -> MatchResult:
    """Top-K queries per gt person (matcher.py:232-262), dense.

    cost: (B, Q, M); num_person: (B,) int.
    """
    B, Q, M = cost.shape
    # invalid gt slots should not affect anything; their matches are masked
    neg_cost = -jnp.swapaxes(cost, 1, 2)  # (B, M, Q)
    _, idx = jax.lax.top_k(neg_cost, k)   # (B, M, K) query indices
    gt_valid = jnp.arange(M)[None, :] < num_person[:, None]

    onehot = jax.nn.one_hot(idx, Q, dtype=jnp.float32)  # (B, M, K, Q)
    onehot = onehot * gt_valid[:, :, None, None]
    query_mask = jnp.sum(onehot, axis=(1, 2)) > 0  # (B, Q)
    return MatchResult(query_idx=idx.astype(jnp.int32),
                       gt_valid=gt_valid, query_mask=query_mask)


def threshold_match(cost: jnp.ndarray, num_person: jnp.ndarray,
                    thresh: float, k_cap: int) -> MatchResult:
    """'multiple' matching (matcher.py:201-230): every query whose best gt is
    within `thresh` matches that gt. Dense form: top-k_cap queries per gt
    filtered by the threshold (k_cap bounds the static shape)."""
    B, Q, M = cost.shape
    gt_valid = jnp.arange(M)[None, :] < num_person[:, None]
    # padded gt slots must not attract the argmin (the reference
    # restricts the cost matrix to the first num_person columns,
    # matcher.py:201-230); an all-zeros padding pose can otherwise be
    # closer than any real gt
    cost = jnp.where(gt_valid[:, None, :], cost, jnp.inf)
    best_gt = jnp.argmin(cost, axis=-1)  # (B, Q)
    best_cost = jnp.min(cost, axis=-1)
    is_match = best_cost < thresh  # (B, Q)

    # per-gt: the k_cap best queries that chose this gt and pass the threshold
    choose = jax.nn.one_hot(best_gt, M, dtype=bool) & is_match[..., None]
    masked_cost = jnp.where(jnp.swapaxes(choose, 1, 2),
                            jnp.swapaxes(cost, 1, 2), jnp.inf)  # (B, M, Q)
    vals, idx = jax.lax.top_k(-masked_cost, k_cap)
    pair_valid = jnp.isfinite(-vals)  # (B, M, K)
    onehot = jax.nn.one_hot(idx, Q, dtype=jnp.float32)
    onehot = onehot * (pair_valid & gt_valid[:, :, None])[..., None]
    query_mask = jnp.sum(onehot, axis=(1, 2)) > 0
    return MatchResult(query_idx=idx.astype(jnp.int32),
                       gt_valid=gt_valid & jnp.any(pair_valid, -1),
                       query_mask=query_mask,
                       pair_valid=pair_valid & gt_valid[:, :, None])


def hungarian_match_host(cost: np.ndarray, num_person: np.ndarray):
    """Host-side Hungarian assignment (scipy), one (query_ids, gt_ids) pair
    per batch item — the reference's eval/default path
    (matcher.py:179-181). Not jittable; call outside the step."""
    from scipy.optimize import linear_sum_assignment

    out = []
    for b in range(cost.shape[0]):
        n = int(num_person[b])
        q_ids, g_ids = linear_sum_assignment(cost[b][:, :n])
        out.append((q_ids.astype(np.int64), g_ids.astype(np.int64)))
    return out


def hungarian_match_callback(cost: jnp.ndarray,
                             num_person: jnp.ndarray) -> MatchResult:
    """Hungarian assignment inside a traced step via jax.pure_callback.

    The scipy solve runs on the host per step — the same host round trip the
    reference takes (matcher.py:176-181 moves C to the CPU every call); use
    KNN for fully-on-device training. K=1 dense result."""
    # the assignment is a non-differentiable decision and pure_callback
    # has no JVP rule — without this, any differentiated loss using the
    # hungarian assignment crashes under jax.grad
    cost = jax.lax.stop_gradient(cost)
    B, Q, M = cost.shape

    def host_fn(cost_np, num_np):
        from scipy.optimize import linear_sum_assignment

        query_idx = np.zeros((B, M, 1), dtype=np.int32)
        gt_valid = np.zeros((B, M), dtype=bool)
        query_mask = np.zeros((B, Q), dtype=bool)
        for b in range(B):
            n = int(num_np[b])
            if n == 0:
                continue
            q_ids, g_ids = linear_sum_assignment(
                np.asarray(cost_np[b][:, :n], dtype=np.float64))
            for q, g in zip(q_ids, g_ids):
                query_idx[b, g, 0] = q
                gt_valid[b, g] = True
                query_mask[b, q] = True
        return query_idx, gt_valid, query_mask

    out_shapes = (
        jax.ShapeDtypeStruct((B, M, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, M), jnp.bool_),
        jax.ShapeDtypeStruct((B, Q), jnp.bool_),
    )
    query_idx, gt_valid, query_mask = jax.pure_callback(
        host_fn, out_shapes, cost, num_person, vmap_method="sequential")
    return MatchResult(query_idx=query_idx, gt_valid=gt_valid,
                       query_mask=query_mask)


def hungarian_to_match_result(pairs, B: int, Q: int, M: int) -> MatchResult:
    """Convert host Hungarian output to the dense MatchResult (K=1)."""
    query_idx = np.zeros((B, M, 1), dtype=np.int32)
    gt_valid = np.zeros((B, M), dtype=bool)
    query_mask = np.zeros((B, Q), dtype=bool)
    for b, (q_ids, g_ids) in enumerate(pairs):
        for q, g in zip(q_ids, g_ids):
            query_idx[b, g, 0] = q
            gt_valid[b, g] = True
            query_mask[b, q] = True
    return MatchResult(jnp.asarray(query_idx), jnp.asarray(gt_valid),
                       jnp.asarray(query_mask))
