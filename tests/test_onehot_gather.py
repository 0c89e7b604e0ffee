"""Exactness tests for the sorted-window one-hot MXU gather
(ops/onehot_gather.py, VERDICT r4 item 1).

The kernel runs in interpret mode on CPU (MVG_ONEHOT_INTERPRET=1);
block/window constants are monkeypatched small so the per-block grid
stays fast. The contract under test: deform_gather_reduce equals the
plain gather+reduce for ALL inputs — locality-friendly indices (the
fast path), adversarial escapes (the repair path), over-capacity
escapes (the cond fallback), and gradients (custom_vjp)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvgformer_tpu.ops import onehot_gather as og
from mvgformer_tpu.ops.onehot_gather import (_reference_reduce,
                                             deform_gather_reduce)


@pytest.fixture(autouse=True)
def small_kernel(monkeypatch):
    monkeypatch.setenv("MVG_ONEHOT_INTERPRET", "1")
    monkeypatch.setattr(og, "BS", 128)
    monkeypatch.setattr(og, "W", 256)
    monkeypatch.setattr(og, "E_CAP", 64)


def _inputs(rng, NH=2, R=1024, S=512, C=64, local=True):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(rng), 3)
    tables = jax.random.normal(k1, (NH, R, C), jnp.float32)
    if local:
        # clustered rows: block-sorted spans well under W
        centers = jax.random.randint(k2, (NH, S // 64, 1), 0, R - 64)
        idx = (centers + jax.random.randint(
            k3, (NH, S // 64, 64), 0, 48)).reshape(NH, S)
        idx = jnp.clip(idx, 0, R - 1).astype(jnp.int32)
    else:
        idx = jax.random.randint(k2, (NH, S), 0, R, dtype=jnp.int32)
    w4 = jax.random.normal(k3, (NH, S, 4), jnp.float32)
    return tables, idx, w4


class TestDeformGatherReduce:
    def test_local_indices_exact(self):
        """Locality-friendly indices: kernel path, zero/few escapes."""
        tables, idx, w4 = _inputs(0, local=True)
        a = np.asarray(deform_gather_reduce(tables, idx, w4))
        b = np.asarray(_reference_reduce(tables, idx, w4))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_adversarial_escapes_repaired(self):
        """Uniform-random indices escape constantly; the compaction
        repair (or cond fallback when > E_CAP) must keep it exact."""
        tables, idx, w4 = _inputs(1, local=False)
        a = np.asarray(deform_gather_reduce(tables, idx, w4))
        b = np.asarray(_reference_reduce(tables, idx, w4))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_mixed_escape_capacity(self, monkeypatch):
        """A few escaped samples (< E_CAP): exercises the repair
        scatter, not the fallback."""
        tables, idx, w4 = _inputs(2, local=True)
        # corrupt 16 samples to far rows
        idx = idx.at[:, ::37].set(
            (idx[:, ::37] + 700) % tables.shape[1])
        a = np.asarray(deform_gather_reduce(tables, idx, w4))
        b = np.asarray(_reference_reduce(tables, idx, w4))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_non_divisible_s_falls_back(self):
        tables, idx, w4 = _inputs(3, S=500, local=False)
        a = np.asarray(deform_gather_reduce(tables, idx, w4))
        b = np.asarray(_reference_reduce(tables, idx, w4))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_grad_matches_reference(self):
        tables, idx, w4 = _inputs(4, local=True)

        def loss_new(t, w):
            return jnp.sum(deform_gather_reduce(t, idx, w) ** 2)

        def loss_ref(t, w):
            return jnp.sum(_reference_reduce(t, idx, w) ** 2)

        ga = jax.grad(loss_new, argnums=(0, 1))(tables, w4)
        gb = jax.grad(loss_ref, argnums=(0, 1))(tables, w4)
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-4)

    def test_jit_under_vmapless_cond(self):
        """jits cleanly (cond fallback traced, not executed)."""
        tables, idx, w4 = _inputs(5, local=True)
        f = jax.jit(deform_gather_reduce)
        a = np.asarray(f(tables, idx, w4))
        b = np.asarray(_reference_reduce(tables, idx, w4))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestSamplerIntegration:
    def test_full_sampler_matches(self, monkeypatch):
        """deform_sample_corner under MVG_SAMPLER_IMPL=onehot matches
        the default gather path at a dense-layer-sized shape."""
        monkeypatch.setenv("MVG_SAMPLER_IMPL", "")
        from mvgformer_tpu.ops.sampling import deform_sample_corner

        SHAPES = ((32, 60), (16, 30))
        N, Lq, H, D, P = 1, 8192, 1, 16, 4
        total = sum(h * w for h, w in SHAPES)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
        value = jax.random.normal(k1, (N, total, H, D), jnp.float32)
        locs = jax.random.uniform(
            k2, (N, Lq, H, len(SHAPES), P, 2), minval=-0.1, maxval=1.1)
        aw = jax.random.uniform(k3, (N, Lq, H, len(SHAPES), P))

        base = np.asarray(deform_sample_corner(value, SHAPES, locs, aw))
        monkeypatch.setenv("MVG_SAMPLER_IMPL", "onehot")
        fast = np.asarray(deform_sample_corner(value, SHAPES, locs, aw))
        np.testing.assert_allclose(fast, base, rtol=2e-4, atol=2e-4)
