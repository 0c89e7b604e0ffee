"""Confidence-weighted DLT triangulation, fully batched for TPU.

Replicates triangulate_point_from_multiple_views_linear_torch_batch
(/root/reference/lib/mvn/utils/multiview.py:170-228): build per-point
A = conf * (p * P_row3 - P_rows12), take the null-space direction of A, and
dehomogenize. The reference loops over batch items and calls torch SVD per
sample (multiview.py:257-269); here all (batch, points) collapse into one
batched solve.

Solvers:
    'eigh' (default) -- null vector = eigenvector of the smallest eigenvalue
        of the 4x4 Gram matrix AᵀA. On TPU a batched 4x4 eigh is far cheaper
        than SVD of (2V, 4) stacks, and the dehomogenization v[:3]/v[3] is
        sign-invariant, so it matches the reference's -V[:, 3] convention
        (multiview.py:220-221) exactly up to fp error.
    'svd'  -- jnp.linalg.svd of A, bit-closer mirror of the reference.
    'jacobi' -- same Gram formulation as 'eigh' but solved with a
        fixed-sweep scalarized cyclic-Jacobi rotation loop instead of
        jnp.linalg.eigh. XLA's batched eigh/svd on (3840, 4, 4)-class
        problems costs 17-23 ms on v5e; the Jacobi loop (10 Gram entries +
        16 eigenvector entries kept as flat per-point arrays, every
        rotation pure elementwise math that XLA fuses) costs ~1.5 ms and
        agrees with eigh to ~1e-4 on the unit eigenvector (f32-limited;
        converged after 5 of the 6 sweeps). Production inference solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_JACOBI_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def jacobi4_smallest(G: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric (..., 4, 4) G.

    Fixed-count cyclic Jacobi, fully scalarized: the matrix lives as 10
    unique-entry arrays and the accumulated rotation as 16, so every
    update is elementwise over the batch (no batched 4x4 matmuls, which
    are overhead-bound on TPU at this size).
    """
    a = {(i, j): G[..., i, j].astype(jnp.float32)
         for i in range(4) for j in range(i, 4)}
    zero = jnp.zeros_like(a[(0, 0)])
    one = jnp.ones_like(zero)
    v = {(r, cix): (one if r == cix else zero)
         for r in range(4) for cix in range(4)}

    def get(i, j):
        return a[(i, j)] if i <= j else a[(j, i)]

    def put(i, j, val):
        a[(i, j) if i <= j else (j, i)] = val

    for _ in range(sweeps):
        for (p, q) in _JACOBI_PAIRS:
            app, aqq, apq = a[(p, p)], a[(q, q)], a[(p, q)]
            # skip rotations on NEGLIGIBLE off-diagonals, judged relative
            # to the diagonal (classical Jacobi convergence test). The
            # old absolute 1e-30 guard admitted apq ~ 1e-20-class values
            # whose rotation is a numerical no-op forward but whose VJP
            # carries 1/apq^2 factors that overflow f32 into NaN — this
            # poisoned every training gradient (measured 2026-08-17;
            # grads finite with the relative guard, NaN without). The
            # eigenvector change from skipping these rotations is
            # <= ~1e-12 relative.
            # the absolute 1e-15 floor bounds the division VJP's
            # 1/apq^2 factor (< 1e30, finite in f32) even for grams far
            # below unit scale; triangulate_dlt's column equilibration
            # makes the relative term dominate in practice
            small = jnp.abs(apq) <= (1e-12 * (jnp.abs(app) + jnp.abs(aqq))
                                     + 1e-15)
            safe = jnp.where(small, 1.0, apq)
            tau = (aqq - app) / (2.0 * safe)
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(tau == 0.0, 1.0, t)  # tau=0 -> 45-degree rotation
            t = jnp.where(small, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            a[(p, p)] = app - t * apq
            a[(q, q)] = aqq + t * apq
            a[(p, q)] = jnp.where(small, apq, 0.0)
            for r in range(4):
                if r == p or r == q:
                    continue
                arp, arq = get(r, p), get(r, q)
                put(r, p, c * arp - s * arq)
                put(r, q, s * arp + c * arq)
            for r in range(4):
                vrp, vrq = v[(r, p)], v[(r, q)]
                v[(r, p)] = c * vrp - s * vrq
                v[(r, q)] = s * vrp + c * vrq

    vals = jnp.stack([a[(i, i)] for i in range(4)], axis=-1)
    idx = jnp.argmin(vals, axis=-1)
    cols = jnp.stack(
        [jnp.stack([v[(r, cix)] for cix in range(4)], axis=-1)
         for r in range(4)], axis=-2)  # (..., row, col)
    return jnp.take_along_axis(cols, idx[..., None, None], axis=-1)[..., 0]


def clip_cotangent(x: jnp.ndarray, max_norm: float) -> jnp.ndarray:
    """Identity whose VJP clips each last-axis vector's cotangent to
    `max_norm` (rescaled, direction preserved).

    Training stabilizer for gradients that arrive THROUGH an
    ill-conditioned DLT solve: the solve's jacobian w.r.t. its 2D pixel
    inputs amplifies the (bounded, L1) 3D-loss cotangent by the system's
    condition number — on the near-degenerate triangulations that
    random-init queries produce, orders of magnitude — so the summed
    gradient on the offset net is dominated by solver noise rather than
    the well-behaved 2D-reprojection term. Bounding the per-point norm
    here restores that balance; systematic signal survives (consistent
    directions accumulate in Adam's momentum), chaotic directions cancel.
    Forward is bit-identical; no reference equivalent (the reference
    never trains from scratch). Gated by TRAIN.TRI_GRAD_CLIP.
    """
    max_norm = float(max_norm)

    @jax.custom_vjp
    def _identity(v):
        return v

    def _fwd(v):
        return v, None

    def _bwd(_, g):
        n = jnp.linalg.norm(g.astype(jnp.float32), axis=-1, keepdims=True)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-30))
        return (g * scale.astype(g.dtype),)

    _identity.defvjp(_fwd, _bwd)
    return _identity(x)


def homogeneous_to_euclidean(points: jnp.ndarray) -> jnp.ndarray:
    """(..., D+1) -> (..., D). multiview.py:homogeneous_to_euclidean."""
    return points[..., :-1] / points[..., -1:]


def _dlt_system(proj: jnp.ndarray, points2d: jnp.ndarray,
                confidences: jnp.ndarray | None) -> jnp.ndarray:
    """Build A (..., 2V, 4) from proj (..., V, 3, 4), points (..., V, 2)."""
    row3 = proj[..., 2:3, :]  # (..., V, 1, 4)
    rows12 = proj[..., :2, :]  # (..., V, 2, 4)
    A = row3 * points2d[..., :, :, None] - rows12  # (..., V, 2, 4)
    if confidences is not None:
        A = A * confidences[..., :, None, None]
    shape = A.shape
    return A.reshape(shape[:-3] + (shape[-3] * 2, 4))


def triangulate_dlt(proj: jnp.ndarray, points2d: jnp.ndarray,
                    confidences: jnp.ndarray | None = None,
                    solver: str = "eigh") -> jnp.ndarray:
    """Triangulate 3D points from multiple views.

    Args:
        proj:        (..., V, 3, 4) projection matrices.
        points2d:    (..., V, 2) pixel observations (original image coords,
                     already undistorted).
        confidences: (..., V) per-view weights in [0, 1], or None.
        solver:      'eigh' | 'svd'.

    Returns:
        (..., 3) triangulated points.
    """
    A = _dlt_system(proj, points2d, confidences).astype(jnp.float32)
    # Degenerate-system guard: a query outside every view's bounds gets
    # all-zero confidences -> A == 0 exactly -> the null-space direction
    # is undefined and every solver's forward (w == 0 homogeneous
    # divide) and VJP (svd/eigh eigenvalue ties) produce NaN. Downstream
    # query masks hide the NaN in the FORWARD, but the jacobians of the
    # ops between the mask and here still turn the masked-out cotangent
    # into NaN that reaches every parameter (this froze from-scratch
    # training; measured 2026-08-17). Substitute a well-posed system
    # with DISTINCT singular values (rows e0, e1/2, e2/4 -> unique null
    # vector e3 -> the origin) directly at A: jnp.where's VJP is a
    # select, so the dead branch's gradient is dropped exactly here, and
    # non-degenerate systems see bit-identical math.
    degen = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True) < 1e-10
    tmpl = jnp.zeros(A.shape[-2:], A.dtype)
    tmpl = tmpl.at[0, 0].set(1.0).at[1, 1].set(0.5).at[2, 2].set(0.25)
    A = jnp.where(degen, tmpl, A)
    if solver == "svd":
        _, _, vh = jnp.linalg.svd(A, full_matrices=False)
        v = -vh[..., 3, :]  # matches multiview.py:220 sign convention
    elif solver == "jacobi":
        colscale = jnp.max(jnp.abs(A), axis=-2, keepdims=True) + 1e-12
        An = A / colscale
        gram = jnp.matmul(jnp.swapaxes(An, -1, -2), An,
                          precision=jax.lax.Precision.HIGHEST)
        v = jacobi4_smallest(gram) / colscale[..., 0, :]
    elif solver == "eigh":
        # Column-equilibrate before forming the Gram matrix: raw A entries
        # reach ~1e7 (pixels x focal x mm translations), and squaring that
        # overflows f32's mantissa. Scaling columns leaves the exact
        # null-space direction unchanged (A D D^-1 v = 0) and keeps the
        # 4x4 eigproblem well-conditioned in f32.
        colscale = jnp.max(jnp.abs(A), axis=-2, keepdims=True) + 1e-12
        An = A / colscale
        gram = jnp.matmul(jnp.swapaxes(An, -1, -2), An,
                          precision=jax.lax.Precision.HIGHEST)
        _, vecs = jnp.linalg.eigh(gram)  # eigenvalues ascending
        v = vecs[..., :, 0] / colscale[..., 0, :]
    else:
        raise ValueError(f"unknown solver: {solver}")
    return homogeneous_to_euclidean(v)
