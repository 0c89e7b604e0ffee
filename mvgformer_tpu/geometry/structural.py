"""Structural triangulation: bone-length-constrained 3D pose recovery.

Rebuild of /root/reference/lib/structural/structural_triangulation.py
(DictTree/conv matrices :8-180, Pose3D_inference :330-485, SCA iterations
ST_SCA :509-548) and its adapter (lib/structural/adapter.py:20-90), used by
the decoder's `triangulation_method: 'st'` option.

Formulation (same math): minimize the confidence-weighted reprojection
quadratic over joints X subject to bone lengths. With G the bone<->joint
conversion, D = 2 KRᵀ P KR (block-diagonal per joint), the problem reduces
to a (3(Nj-1)) quadratic in the bone vector b: A b = beta, refined by the
step-constraint algorithm (SCA) that renormalizes bone lengths toward the
targets via rank-(Nj-1) inverse updates.

TPU-native differences: everything is batched with vmap over persons and
jit-compiled — the reference loops persons in Python and rebuilds
225x225 numpy block matrices per call; here the per-person matrices are
built with static scatters once per trace, all solves are batched
jnp.linalg ops, and the SCA loop is unrolled (n_steps is static).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

# kinematic trees: list of (child, parent), root first joint index
# (structural_triangulation.py:119-180)
TREES = {
    "cmupanoptic": {
        "root": 0,
        "bones": [(1, 0), (2, 0), (3, 0), (4, 3), (5, 4), (9, 0), (10, 9),
                  (11, 10), (6, 2), (12, 2), (7, 6), (8, 7), (13, 12),
                  (14, 13)],
        "size": 15,
    },
    "human36m": {
        "root": 0,
        "bones": [(2, 0), (1, 2), (6, 1), (3, 0), (4, 3), (5, 4), (7, 0),
                  (8, 7), (16, 8), (9, 16), (13, 8), (14, 13), (15, 14),
                  (12, 8), (11, 12), (10, 11)],
        "size": 17,
    },
    "totalcapture": {
        "root": 0,
        "bones": [(2, 0), (1, 2), (6, 1), (3, 0), (4, 3), (5, 4), (7, 0),
                  (8, 7), (9, 8), (13, 8), (14, 13), (15, 14), (12, 8),
                  (11, 12), (10, 11)],
        "size": 16,
    },
}


class HumanTree:
    """Joint<->bone conversion matrices for a kinematic tree
    (DictTree.get_conv_mat, structural_triangulation.py:42-60)."""

    def __init__(self, data_type: str = "cmupanoptic"):
        spec = TREES[data_type]
        self.size = spec["size"]
        self.root = spec["root"]
        parent = {c: p for c, p in spec["bones"]}
        n = self.size
        conv = np.zeros((n * 3, n * 3))
        for i in range(n):
            if i == self.root:
                conv[0:3, 3 * i:3 * i + 3] = np.eye(3)
            elif i < self.root:
                p = parent[i]
                conv[3 * i + 3:3 * i + 6, 3 * i:3 * i + 3] = np.eye(3)
                conv[3 * i + 3:3 * i + 6, 3 * p:3 * p + 3] = -np.eye(3)
            else:
                p = parent[i]
                conv[3 * i:3 * i + 3, 3 * i:3 * i + 3] = np.eye(3)
                conv[3 * i:3 * i + 3, 3 * p:3 * p + 3] = -np.eye(3)
        self.conv_J2B = conv
        self.conv_B2J = np.linalg.inv(conv)

    def bone_lengths(self, poses3d: np.ndarray) -> np.ndarray:
        """(F, J, 3) -> (F, J-1) gt bone lengths (get_bl_mat, :111-118)."""
        f = poses3d.shape[0]
        bones = (poses3d.reshape(f, -1) @ self.conv_J2B.T)[:, 3:]
        return np.linalg.norm(bones.reshape(f, -1, 3), axis=2)


def _inner_mat(u, v):
    """Reprojection quadratic form of one 2D observation
    (get_inner_mat, structural_triangulation.py:182-183)."""
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    return jnp.stack([
        jnp.stack([one, zero, -u], -1),
        jnp.stack([zero, one, -v], -1),
        jnp.stack([-u, -v, u * u + v * v], -1),
    ], -2)


def _st_one_person(points2d, confidences, lengths, projections, tree_B2J,
                   n_steps: int, method: str):
    """points2d (V, J, 2); confidences (V, J); lengths (J-1,);
    projections (V, 3, 4) -> (J, 3). Mirrors Pose3D_inference_torch."""
    V, Nj, _ = points2d.shape
    G = jnp.asarray(tree_B2J, dtype=jnp.float32)

    KR = projections[:, :, :3]   # (V, 3, 3)
    KRT = projections[:, :, 3]   # (V, 3)

    # per-(joint, view) inner mats scaled by confidence
    M = _inner_mat(points2d[..., 0], points2d[..., 1])  # (V, J, 3, 3)
    M = M * confidences[..., None, None]
    # D_i = 2 sum_j KR_jT M_ij KR_j   (block-diag of the reference's D)
    Dblocks = 2.0 * jnp.einsum(
        "vab,vjbc,vcd->jad", jnp.swapaxes(KR, -1, -2), M, KR,
        precision=jax.lax.Precision.HIGHEST)  # (J, 3, 3)
    # m_i = 2 sum_j KR_jT M_ij (-KRT_j)  -> the reference's m (3Nj, 1)
    mblocks = 2.0 * jnp.einsum(
        "vab,vjbc,vc->ja", jnp.swapaxes(KR, -1, -2), M, -KRT,
        precision=jax.lax.Precision.HIGHEST)  # (J, 3)

    # dense (3J, 3J) D and (3J,) m
    D = jax.scipy.linalg.block_diag(*[Dblocks[i] for i in range(Nj)])
    m = mblocks.reshape(-1, 1)

    Irow = jnp.tile(jnp.eye(3), (1, Nj))  # (3, 3J)
    MrowFull = _mm(Irow, D)               # (3, 3J)
    TrLam = _mm(MrowFull, Irow.T)         # (3, 3)
    Mrow = MrowFull[:, 3:]
    TrM_inv = jnp.linalg.inv(TrLam)

    Gbb = G[3:, 3:]
    Q = jnp.concatenate(
        [-_mm(_mm(TrM_inv, Mrow), Gbb), jnp.eye(Nj * 3 - 3)], axis=0)
    p = jnp.concatenate(
        [-_mm(TrM_inv, _mm(Irow, m)), jnp.zeros((Nj * 3 - 3, 1))], axis=0)

    GD = _mm(G.T, D)
    A = _mm(Q.T, _mm(GD, _mm(G, Q)))
    beta = (_mm(p.T, _mm(GD, _mm(G, Q))) + _mm(m.T, _mm(G, Q))).T

    A_inv = jnp.linalg.inv(A)
    b = _mm(A_inv, beta)  # (3(J-1), 1) least-squares bones

    if method == "ST":
        # SCA refinements (ST_SCA, :509-548)
        D31 = jnp.repeat(jnp.eye(Nj - 1), 3, axis=0)  # (3(J-1), J-1)
        Inv = A_inv
        for i in range(n_steps):
            start_len = jnp.linalg.norm(
                b.reshape(-1, 3), axis=1, keepdims=True)  # (J-1, 1)
            target_len = (start_len * (n_steps - i - 1)
                          + lengths.reshape(-1, 1)) / (n_steps - i)
            Db = jnp.diag(b.reshape(-1))
            core = _mm(D31.T, _mm(Db, _mm(Inv, _mm(Db, D31))))
            lam = _mm(jnp.linalg.inv(core),
                      (start_len ** 2 - target_len ** 2)) / 4.0
            d_lambda = jnp.diag(jnp.repeat(2.0 * lam.reshape(-1), 3))
            Inv = _mm(jnp.eye(3 * Nj - 3) - _mm(Inv, d_lambda), Inv)
            b = _mm(Inv, beta)
    elif method == "Lagrangian":
        lam = jnp.zeros((Nj - 1, 1))
        D31 = jnp.repeat(jnp.eye(Nj - 1), 3, axis=0)
        alpha, beta_lr = 2e-9, 0.5
        for _ in range(n_steps):
            Dh = _mm(D31.T, jnp.diag(b.reshape(-1)))
            bn = b - alpha * (_mm(A, b) - beta + 2 * _mm(Dh.T, lam))
            hk = (jnp.sum(b.reshape(-1, 3) ** 2, axis=1, keepdims=True)
                  - lengths.reshape(-1, 1) ** 2)
            lam = lam + beta_lr * hk
            b = bn
    elif method != "LS":
        raise ValueError(method)

    x0 = -_mm(TrM_inv, _mm(Mrow, _mm(Gbb, b)) - _mm(Irow, m))
    X = _mm(G, jnp.concatenate([x0, b], axis=0))
    return X.reshape(Nj, 3)


def structural_triangulate(projections: jnp.ndarray,
                           points2d: jnp.ndarray,
                           confidences: Optional[jnp.ndarray] = None,
                           bone_lengths: Optional[jnp.ndarray] = None,
                           n_steps: int = 1,
                           method: str = "ST",
                           data_type: str = "cmupanoptic") -> jnp.ndarray:
    """Batched structural triangulation.

    Args:
        projections:  (B, V, 3, 4).
        points2d:     (B, V, J, 2) undistorted original-image points.
        confidences:  (B, V, J) or None (uniform 1/V, adapter behavior).
        bone_lengths: (B, J-1) target lengths (mm). Required for 'ST'.
        n_steps:      SCA steps (static; 1 = pure ST).
    Returns:
        (B, J, 3) triangulated poses.
    """
    tree = HumanTree(data_type)
    B, V, Nj, _ = points2d.shape
    if confidences is None:
        confidences = jnp.full((B, V, Nj), 1.0 / V, dtype=jnp.float32)
    if bone_lengths is None:
        if method.upper() == "ST":
            # zero target lengths would drive every bone toward zero via
            # the SCA step — a silent-garbage default; make callers pass
            # real lengths (the adapter derives them from the T-pose)
            raise ValueError(
                "structural_triangulate(method='ST') requires "
                "bone_lengths; pass target lengths or use method='LS'")
        bone_lengths = jnp.zeros((B, Nj - 1), dtype=jnp.float32)

    fn = lambda p2, cf, ln, pj: _st_one_person(
        p2.astype(jnp.float32), cf.astype(jnp.float32),
        ln.astype(jnp.float32), pj.astype(jnp.float32),
        tree.conv_B2J, n_steps, method)
    return jax.vmap(fn)(points2d, confidences, bone_lengths, projections)
