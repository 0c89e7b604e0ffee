"""Geometry parity tests: projection, affine, undistortion, triangulation.

Parity oracles are the reference's own torch implementations (imported from
the read-only checkout; skipped when absent) plus cv2 for undistortion and
synthetic round-trip properties mirroring the reference's embedded unit test
unit_test_st (/root/reference/process/extract_dataset.py:209-322).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvgformer_tpu.data.synthetic import make_camera_ring, make_people
from mvgformer_tpu.geometry import (
    CameraParams,
    project_points,
    undistort_points,
    projection_matrices,
    triangulate_dlt,
    get_affine_transform,
    get_affine_transform_inv,
    apply_affine,
    get_scale,
    norm2absolute,
    absolute2norm,
)

from oracles import reference_available, ref_cameras, ref_transforms, \
    ref_multiview, make_torch_cam_dict

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def _batched_cams(B=2, V=5, seed=0):
    cams = make_camera_ring(V, seed=seed)
    # tile across batch
    def tile(x):
        return np.broadcast_to(x, (B,) + x.shape).copy()
    return CameraParams(**{k: tile(getattr(cams, k))
                           for k in ("R", "T", "f", "c", "k", "p")})


class TestProjection:
    @needs_ref
    def test_project_matches_reference(self):
        import torch
        cameras = ref_cameras()
        B, V, N = 2, 5, 30
        cams = _batched_cams(B, V)
        rng = np.random.RandomState(1)
        pts = np.concatenate([make_people(2, seed=i).reshape(-1, 3)
                              for i in range(B)])[:N]
        x = np.broadcast_to(pts, (B, V, N, 3)).astype(np.float32).copy()

        ours = np.asarray(project_points(jnp.asarray(x), cams))

        cam_dict = make_torch_cam_dict(cams.R, cams.T, cams.f, cams.c,
                                       cams.k, cams.p)
        theirs = cameras.project_pose_batch(
            torch.as_tensor(x), cam_dict).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-2)

    def test_projection_center(self):
        """A point at the optical axis projects to the principal point."""
        cams = make_camera_ring(3, distortion=False, seed=3)
        center = np.array([[0.0, -500.0, 800.0]], dtype=np.float32)
        pix = np.asarray(project_points(
            jnp.broadcast_to(center, (3, 1, 3)), cams))
        np.testing.assert_allclose(pix[:, 0], np.asarray(cams.c),
                                   rtol=0, atol=1.0)


class TestAffine:
    @needs_ref
    def test_affine_matches_cv2(self):
        transforms = ref_transforms()
        img_size = np.array([1920, 1080], dtype=np.float32)
        net_size = (960, 512)
        center = img_size / 2.0
        scale = get_scale(img_size, net_size)
        ours = np.asarray(get_affine_transform(center, scale, net_size))
        theirs = transforms.get_affine_transform(center, scale, 0, net_size)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)

        ours_inv = np.asarray(
            get_affine_transform_inv(center, scale, net_size))
        theirs_inv = transforms.get_affine_transform(
            center, scale, 0, net_size, inv=1)
        np.testing.assert_allclose(ours_inv, theirs_inv, rtol=1e-5, atol=1e-4)

    @needs_ref
    def test_affine_tall_branch(self):
        """Exercise the src_h > src_w aspect branch."""
        transforms = ref_transforms()
        img_size = np.array([288, 360], dtype=np.float32)
        net_size = (256, 512)
        center = img_size / 2.0
        scale = get_scale(img_size, net_size)
        ours = np.asarray(get_affine_transform(center, scale, net_size))
        theirs = transforms.get_affine_transform(center, scale, 0, net_size)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)

    def test_affine_roundtrip(self):
        img_size = np.array([1920, 1080], dtype=np.float32)
        net_size = (960, 512)
        center = img_size / 2.0
        scale = get_scale(img_size, net_size)
        fwd = get_affine_transform(center, scale, net_size)
        inv = get_affine_transform_inv(center, scale, net_size)
        pts = jnp.asarray(np.random.RandomState(0)
                          .uniform(0, 1900, size=(10, 2)).astype(np.float32))
        back = apply_affine(apply_affine(pts, fwd), inv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   rtol=1e-4, atol=1e-2)


class TestUndistort:
    def test_undistort_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        cams = make_camera_ring(4, seed=5)
        people = make_people(3, seed=2)
        pts3d = np.broadcast_to(
            people.reshape(-1, 3), (4, 45, 3)).astype(np.float32)
        pix = np.asarray(project_points(jnp.asarray(pts3d), cams))

        ours = np.asarray(undistort_points(jnp.asarray(pix), cams,
                                           iter_num=5))
        for v in range(4):
            K = np.array([
                [cams.f[v, 0], 0, cams.c[v, 0]],
                [0, cams.f[v, 1], cams.c[v, 1]],
                [0, 0, 1],
            ], dtype=np.float64)
            dist = np.array([cams.k[v, 0], cams.k[v, 1], cams.p[v, 0],
                             cams.p[v, 1], cams.k[v, 2]], dtype=np.float64)
            und = cv2.undistortPoints(
                pix[v].reshape(-1, 1, 2).astype(np.float64), K, dist,
                P=K).reshape(-1, 2)
            np.testing.assert_allclose(ours[v], und, rtol=1e-3, atol=0.5)

    def test_undistort_inverts_distortion(self):
        """undistort(project_with_distortion) == project_without_distortion."""
        cams = make_camera_ring(5, seed=7)
        people = make_people(4, seed=1)
        pts3d = np.broadcast_to(
            people.reshape(-1, 3), (5, 60, 3)).astype(np.float32)
        pix_dist = project_points(jnp.asarray(pts3d), cams)
        pix_undist = undistort_points(pix_dist, cams, iter_num=5)
        pix_clean = project_points(jnp.asarray(pts3d), cams,
                                   deal_distortion=False)
        np.testing.assert_allclose(np.asarray(pix_undist),
                                   np.asarray(pix_clean), rtol=1e-3, atol=1.5)


class TestTriangulation:
    def _setup(self, B=2, Nj=30, V=5, noise=0.0, seed=0):
        rng = np.random.RandomState(seed)
        cams = _batched_cams(B, V, seed=seed)
        pts3d = np.stack([make_people(2, seed=seed + i).reshape(-1, 3)[:Nj]
                          for i in range(B)])  # (B, Nj, 3)
        x = np.broadcast_to(pts3d[:, None], (B, V, Nj, 3)).astype(np.float32)
        pix = np.asarray(project_points(jnp.asarray(x), cams,
                                        deal_distortion=False))
        if noise:
            pix = pix + rng.normal(0, noise, pix.shape).astype(np.float32)
        proj = np.asarray(projection_matrices(cams, inv_trans=True))
        return cams, pts3d, pix, proj

    @pytest.mark.parametrize("solver", ["eigh", "svd", "jacobi"])
    def test_roundtrip_exact(self, solver):
        cams, pts3d, pix, proj = self._setup()
        B, V, Nj, _ = pix.shape
        # rearrange to (B, Nj, V, 2) / (B, Nj, V, 3, 4)
        p2d = np.transpose(pix, (0, 2, 1, 3))
        pm = np.broadcast_to(proj[:, None], (B, Nj, V, 3, 4))
        out = np.asarray(triangulate_dlt(jnp.asarray(pm), jnp.asarray(p2d),
                                         solver=solver))
        np.testing.assert_allclose(out, pts3d, rtol=1e-3, atol=2.0)

    @needs_ref
    def test_matches_reference_dlt(self):
        import torch
        multiview = ref_multiview()
        cams, pts3d, pix, proj = self._setup(noise=3.0, seed=3)
        B, V, Nj, _ = pix.shape
        conf = np.random.RandomState(4).uniform(
            0.2, 1.0, size=(B, V, Nj)).astype(np.float32)

        theirs = multiview.triangulate_batch_of_points_batch_version(
            torch.as_tensor(proj), torch.as_tensor(pix),
            confidences_batch=torch.as_tensor(conf),
            solver="linalg").numpy()

        p2d = np.transpose(pix, (0, 2, 1, 3))
        pm = np.broadcast_to(proj[:, None], (B, Nj, V, 3, 4))
        cf = np.transpose(conf, (0, 2, 1))
        for solver in ("svd", "eigh", "jacobi"):
            ours = np.asarray(triangulate_dlt(
                jnp.asarray(pm), jnp.asarray(p2d), jnp.asarray(cf),
                solver=solver))
            np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2.0)

    def test_jacobi_matches_eigh_eigenvector(self):
        """jacobi4_smallest == jnp.linalg.eigh smallest eigenvector (up to
        sign) on random PSD 4x4 batches, to f32 precision."""
        from mvgformer_tpu.geometry.triangulate import jacobi4_smallest
        rng = np.random.RandomState(0)
        A = rng.normal(size=(512, 10, 4)).astype(np.float32)
        G = jnp.einsum("bia,bic->bac", A, A)
        ref = np.asarray(jnp.linalg.eigh(G)[1][..., :, 0])
        got = np.asarray(jacobi4_smallest(G))
        sgn = np.sign(np.sum(got * ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sgn, ref, atol=5e-4)

    def test_confidence_downweights_bad_view(self):
        cams, pts3d, pix, proj = self._setup(seed=6)
        B, V, Nj, _ = pix.shape
        # corrupt view 0 badly
        pix_bad = pix.copy()
        pix_bad[:, 0] += 300.0
        conf = np.ones((B, Nj, V), dtype=np.float32)
        conf[..., 0] = 1e-4
        p2d = np.transpose(pix_bad, (0, 2, 1, 3))
        pm = np.broadcast_to(proj[:, None], (B, Nj, V, 3, 4))
        out = np.asarray(triangulate_dlt(jnp.asarray(pm), jnp.asarray(p2d),
                                         jnp.asarray(conf)))
        np.testing.assert_allclose(out, pts3d, rtol=1e-2, atol=15.0)


class TestNormCoords:
    def test_roundtrip(self):
        gs = [8000.0, 8000.0, 2000.0]
        gc = [0.0, -500.0, 800.0]
        x = jnp.asarray(make_people(3, seed=0))
        n = absolute2norm(x, gs, gc)
        back = norm2absolute(n, gs, gc)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=1e-5, atol=1e-2)


class TestTriangulationGradientRobustness:
    """Round-3 fixes: gradient NaNs that froze from-scratch training.

    (a) A query outside every view's bounds produces an all-zero DLT
    system; the guard substitutes a well-posed template (origin output)
    and jnp.where's select-VJP drops the dead branch's gradient.
    (b) jacobi4_smallest skipped rotations only below an absolute 1e-30
    off-diagonal; apq ~ 1e-20-class rotations are forward no-ops whose
    VJP carries 1/apq^2 -> f32 overflow -> NaN in every gradient."""

    def _system(self, degen_query=True):
        rng = np.random.RandomState(0)
        proj = jnp.asarray(rng.randn(1, 3, 5, 3, 4).astype(np.float32)
                           * 100)
        pts = jnp.asarray(rng.rand(1, 3, 5, 2).astype(np.float32) * 400)
        conf = jnp.ones((1, 3, 5), jnp.float32)
        if degen_query:
            conf = conf.at[0, 1].set(0.0)
        return proj, pts, conf

    @pytest.mark.parametrize("solver", ["jacobi", "eigh", "svd"])
    def test_zero_confidence_query_finite_grads(self, solver):
        from mvgformer_tpu.geometry.triangulate import triangulate_dlt

        proj, pts, conf = self._system()

        def f(c):
            return jnp.sum(jnp.abs(triangulate_dlt(proj, pts, c,
                                                   solver=solver)))

        v, g = jax.value_and_grad(f)(conf)
        assert bool(jnp.isfinite(v)), solver
        assert bool(jnp.isfinite(g).all()), solver
        # the degenerate query reads the origin; the others are
        # bit-identical to the unguarded math
        out = triangulate_dlt(proj, pts, conf, solver=solver)
        ref = triangulate_dlt(proj, pts, jnp.ones_like(conf),
                              solver=solver)
        np.testing.assert_array_equal(np.asarray(out[0, 1]),
                                      np.zeros(3, np.float32))
        np.testing.assert_array_equal(np.asarray(out[0, 0]),
                                      np.asarray(ref[0, 0]))
        np.testing.assert_array_equal(np.asarray(out[0, 2]),
                                      np.asarray(ref[0, 2]))

    def test_jacobi_grads_finite_on_generic_grams(self):
        from mvgformer_tpu.geometry.triangulate import jacobi4_smallest

        rng = np.random.RandomState(0)
        A = rng.randn(256, 6, 4).astype(np.float32)
        G = jnp.asarray(np.einsum('bri,brj->bij', A, A))

        def f(g):
            return jnp.sum(jacobi4_smallest(g))

        _, gr = jax.value_and_grad(f)(G)
        assert bool(jnp.isfinite(gr).all())
        # accuracy vs f64 eigh unchanged by the relative guard
        _, vecs = np.linalg.eigh(np.asarray(G, np.float64))
        ref = vecs[..., 0]
        got = np.asarray(jacobi4_smallest(G))
        sign = np.sign(np.sum(got * ref, -1, keepdims=True))
        sign[sign == 0] = 1
        assert np.abs(got - sign * ref).max() < 1e-4


def test_clip_cotangent_identity_forward_clipped_backward():
    """clip_cotangent (TRAIN.TRI_GRAD_CLIP): forward is the identity;
    the VJP rescales each last-axis vector's cotangent to max_norm while
    preserving direction and leaving small cotangents untouched."""
    from mvgformer_tpu.geometry.triangulate import clip_cotangent

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 5, 2).astype(np.float32))
    # forward identity (bit-exact)
    np.testing.assert_array_equal(np.asarray(clip_cotangent(x, 1.0)),
                                  np.asarray(x))

    # cotangents: one row tiny, one row huge
    w = np.ones((4, 5, 2), np.float32)
    w[0, 0] = [0.3, 0.4]        # norm 0.5  (under the clip)
    w[1, 1] = [300.0, 400.0]    # norm 500  (clipped to 1.0)
    w = jnp.asarray(w)

    g = jax.grad(lambda v: jnp.sum(clip_cotangent(v, 1.0) * w))(x)
    g = np.asarray(g)
    np.testing.assert_allclose(g[0, 0], [0.3, 0.4], rtol=1e-6)
    np.testing.assert_allclose(g[1, 1], [0.6, 0.8], rtol=1e-5)
    # direction preserved, norm == max_norm for the clipped row
    assert abs(np.linalg.norm(g[1, 1]) - 1.0) < 1e-5
    # untouched rows: norm sqrt(2) > 1 -> rescaled to 1
    assert abs(np.linalg.norm(g[2, 3]) - 1.0) < 1e-5


@pytest.mark.slow
def test_tri_grad_clip_train_step_same_loss_different_grads():
    """TRAIN.TRI_GRAD_CLIP changes gradients only: the train-step loss
    (forward) is bit-identical with the knob on/off, while the gradient
    through the triangulation's 2D inputs differs."""
    from mvgformer_tpu.config import load_config
    from mvgformer_tpu.data.synthetic import make_batch
    from mvgformer_tpu.models.mvgformer import MVGFormer

    def loss_of(clip):
        cfg = load_config()
        cfg.DECODER.num_instance = 16
        cfg.DECODER.d_model = 32
        cfg.DECODER.dim_feedforward = 32
        cfg.DECODER.num_decoder_layers = 2
        cfg.DATASET.CAMERA_NUM = 3
        cfg.NETWORK.IMAGE_SIZE = [64, 64]
        cfg.POSE_RESNET.NUM_LAYERS = 18
        cfg.POSE_RESNET.NUM_DECONV_FILTERS = [32, 32, 32]
        cfg.TRAIN.TRI_GRAD_CLIP = clip
        from mvgformer_tpu.core.train import (create_train_state,
                                              make_train_step)

        model = MVGFormer(cfg=cfg)
        batch = make_batch(cfg, batch_size=1, seed=0, num_people=2)
        state, tx = create_train_state(cfg, model, batch,
                                       jax.random.PRNGKey(0))
        step_fn = make_train_step(cfg, model, tx, donate=False)
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        return float(metrics["total"]), new_state.params

    v_off, p_off = loss_of(None)
    v_on, p_on = loss_of(0.1)
    assert v_off == v_on  # forward (loss) bit-identical
    # gradients must differ -> post-step params differ somewhere
    leaves_off = jax.tree_util.tree_leaves(p_off)
    leaves_on = jax.tree_util.tree_leaves(p_on)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_off, leaves_on))
