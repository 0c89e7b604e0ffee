"""Structural triangulation tests: parity vs reference + the reference's own
noise-sweep property (unit_test_st, process/extract_dataset.py:209-322)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvgformer_tpu.data.synthetic import make_camera_ring, make_people
from mvgformer_tpu.geometry import project_points, projection_matrices
from mvgformer_tpu.geometry.structural import (
    HumanTree, structural_triangulate)
from mvgformer_tpu.geometry.triangulate import triangulate_dlt

from oracles import reference_available, _init_paths, patch_torch_cpu_only

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def _setup(B=2, V=5, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    cams = make_camera_ring(V, seed=seed)
    people = np.stack([make_people(1, seed=seed + i)[0] for i in range(B)])
    x = np.broadcast_to(people[:, None], (B, V, 15, 3)).astype(np.float32)

    def tile(a):
        return np.broadcast_to(a, (B,) + a.shape).copy()

    from mvgformer_tpu.geometry.cameras import CameraParams
    cams_b = CameraParams(**{k: tile(np.asarray(getattr(cams, k)))
                             for k in ("R", "T", "f", "c", "k", "p")})
    pix = np.asarray(project_points(jnp.asarray(x), cams_b,
                                    deal_distortion=False))
    if noise:
        pix = pix + rng.normal(0, noise, pix.shape).astype(np.float32)
    proj = np.asarray(projection_matrices(cams_b, inv_trans=True))
    tree = HumanTree("cmupanoptic")
    lengths = tree.bone_lengths(people)
    return people, pix, proj, lengths


class TestTreeMatrices:
    @needs_ref
    def test_conv_matrices_match_reference(self):
        _init_paths()
        from structural.structural_triangulation import create_human_tree
        ref = create_human_tree("cmupanoptic")
        ours = HumanTree("cmupanoptic")
        np.testing.assert_allclose(ours.conv_J2B, ref.conv_J2B)
        np.testing.assert_allclose(ours.conv_B2J, ref.conv_B2J, atol=1e-10)

    def test_bone_lengths_roundtrip(self):
        people = make_people(3, seed=1)
        tree = HumanTree("cmupanoptic")
        lengths = tree.bone_lengths(people)
        assert lengths.shape == (3, 14)
        assert (lengths > 50).all() and (lengths < 1200).all()


class TestStructuralTriangulation:
    def test_exact_recovery_noiseless(self):
        people, pix, proj, lengths = _setup(noise=0.0)
        out = np.asarray(structural_triangulate(
            jnp.asarray(proj), jnp.asarray(pix), None,
            jnp.asarray(lengths), n_steps=1, method="LS"))
        np.testing.assert_allclose(out, people, rtol=1e-3, atol=5.0)

    def test_st_beats_plain_dlt_with_noise(self):
        """The reference's unit_test_st property: with noisy 2D and gt bone
        lengths, ST error < plain triangulation error."""
        people, pix, proj, lengths = _setup(B=4, noise=15.0, seed=3)
        B, V, J, _ = pix.shape
        st = np.asarray(structural_triangulate(
            jnp.asarray(proj), jnp.asarray(pix), None,
            jnp.asarray(lengths), n_steps=3, method="ST"))
        pm = np.broadcast_to(proj[:, None], (B, J, V, 3, 4))
        p2 = np.transpose(pix, (0, 2, 1, 3))
        plain = np.asarray(triangulate_dlt(jnp.asarray(pm),
                                           jnp.asarray(p2)))
        err_st = np.linalg.norm(st - people, axis=-1).mean()
        err_plain = np.linalg.norm(plain - people, axis=-1).mean()
        assert err_st < err_plain, (err_st, err_plain)
        # and the bone lengths approach the targets
        tree = HumanTree("cmupanoptic")
        st_lengths = tree.bone_lengths(st)
        plain_lengths = tree.bone_lengths(plain)
        assert (np.abs(st_lengths - lengths).mean()
                < np.abs(plain_lengths - lengths).mean())

    @needs_ref
    def test_matches_reference_st(self):
        import torch
        _init_paths()
        patch_torch_cpu_only()
        from structural.structural_triangulation import (
            Pose3D_inference_torch, create_human_tree)

        people, pix, proj, lengths = _setup(B=2, V=5, noise=8.0, seed=7)
        tree_ref = create_human_tree("cmupanoptic")
        conf = np.random.RandomState(0).uniform(
            0.3, 1.0, size=(2, 5, 15)).astype(np.float32)

        for method, steps in (("LS", 1), ("ST", 2)):
            ours = np.asarray(structural_triangulate(
                jnp.asarray(proj), jnp.asarray(pix), jnp.asarray(conf),
                jnp.asarray(lengths), n_steps=steps, method=method))
            for b in range(2):
                theirs = Pose3D_inference_torch(
                    5, tree_ref, torch.as_tensor(pix[b]),
                    torch.as_tensor(conf[b]),
                    torch.as_tensor(lengths[b].reshape(-1, 1),
                                    dtype=torch.float32),
                    torch.as_tensor(proj[b]), method, steps).numpy()
                np.testing.assert_allclose(ours[b], theirs, rtol=1e-2,
                                           atol=2.0)
