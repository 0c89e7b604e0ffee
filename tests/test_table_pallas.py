"""Pallas corner-table build kernel (ops/table_pallas.py): bit-parity
vs the XLA build, padded-stride indexing equivalence, and the custom
VJP vs jax-AD of the XLA build. Runs in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvgformer_tpu.ops.sampling import build_corner_tables
from mvgformer_tpu.ops.table_pallas import (build_corner_table_level,
                                            build_corner_tables_pallas,
                                            padded_width)

SHAPES = ((8, 12), (4, 6))


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _value(rng, N=2, H=2, D=8):
    total = sum(h * w for h, w in SHAPES)
    return jnp.asarray(rng.randn(N, total, H, D).astype(np.float32))


class TestBuildParity:
    def test_matches_xla_build(self, rng):
        """Kernel rows == XLA build rows at every (y, x); the extra
        lane-alignment columns are zero."""
        value = _value(rng)
        N, _, H, D = value.shape
        ref_tables = build_corner_tables(value, SHAPES)  # (N,H,hp*wp,4D)
        value_hd = jnp.swapaxes(value, 1, 2)
        ktables, strides = build_corner_tables_pallas(value_hd, SHAPES)
        for lvl, (h, w) in enumerate(SHAPES):
            hp, wp = h + 2, w + 2
            wpp = strides[lvl]
            assert wpp == padded_width(w) and wpp % 8 == 0
            got = np.asarray(ktables[lvl]).reshape(N, H, hp, wpp, 4 * D)
            want = np.asarray(ref_tables[lvl]).reshape(N, H, hp, wp,
                                                       4 * D)
            np.testing.assert_array_equal(got[:, :, :, :wp], want)
            np.testing.assert_array_equal(
                got[:, :, :, wp:], np.zeros_like(got[:, :, :, wp:]))

    def test_bf16_dtype(self, rng):
        value = _value(rng).astype(jnp.bfloat16)
        value_hd = jnp.swapaxes(value, 1, 2)
        ktables, _ = build_corner_tables_pallas(value_hd, SHAPES)
        assert all(t.dtype == jnp.bfloat16 for t in ktables)
        ref = build_corner_tables(value, SHAPES)
        h, w = SHAPES[0]
        wpp = padded_width(w)
        got = np.asarray(ktables[0].astype(jnp.float32)).reshape(
            value.shape[0], value.shape[2], h + 2, wpp, -1)
        want = np.asarray(ref[0].astype(jnp.float32)).reshape(
            value.shape[0], value.shape[2], h + 2, w + 2, -1)
        np.testing.assert_array_equal(got[:, :, :, :w + 2], want)


class TestVJP:
    def test_custom_vjp_matches_xla_ad(self, rng):
        """The hand-written transpose == jax AD through the XLA build."""
        h, w = SHAPES[0]
        v = jnp.asarray(rng.randn(3, h, w, 8).astype(np.float32))
        wpp = padded_width(w)

        def loss_pallas(v):
            t = build_corner_table_level(v, h, w)
            return jnp.sum(t ** 2)

        def loss_xla(v):
            # same scalar via the XLA build (the padded-stride frame's
            # extra columns are zeros, so the sums match exactly)
            value = v.reshape(3, h * w, 1, 8)
            t = build_corner_tables(value, ((h, w),))[0]
            return jnp.sum(t ** 2)

        g_pallas = jax.grad(loss_pallas)(v)
        g_xla = jax.grad(loss_xla)(v)
        np.testing.assert_allclose(np.asarray(g_pallas),
                                   np.asarray(g_xla), rtol=1e-5,
                                   atol=1e-5)
        assert wpp >= w + 2
