"""Parity tests for deformable sampling + ProjAttn vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvgformer_tpu.ops import deform_sample, flatten_feature_levels, ProjAttn

from oracles import reference_available, ref_deform_core, ref_projattn

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

SHAPES = ((16, 30), (8, 15), (4, 8))


def _random_inputs(rng, N=2, Lq=12, H=4, D=8, L=3, P=4, shapes=SHAPES):
    len_in = sum(h * w for h, w in shapes)
    value = rng.randn(N, len_in, H, D).astype(np.float32)
    # locations mostly inside [0,1], some outside to test zero padding
    locs = rng.uniform(-0.2, 1.2, size=(N, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.rand(N, Lq, H, L, P).astype(np.float32)
    w = w / w.sum(axis=(-1, -2), keepdims=True)
    return value, locs, w


class TestDeformSample:
    @needs_ref
    def test_matches_reference_core(self, rng):
        import torch
        core = ref_deform_core()
        value, locs, w = _random_inputs(rng)
        ours = np.asarray(deform_sample(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        theirs = core(
            torch.as_tensor(value),
            torch.as_tensor(np.asarray(SHAPES, dtype=np.int64)),
            torch.as_tensor(locs), torch.as_tensor(w)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    @needs_ref
    @pytest.mark.slow
    def test_gradients_match_reference(self, rng):
        import torch
        core = ref_deform_core()
        value, locs, w = _random_inputs(rng, N=1, Lq=6, H=2, D=4, P=3)

        def loss_jax(v, l, a):
            out = deform_sample(v, SHAPES, l, a)
            return jnp.sum(out * out)

        gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))

        tv = torch.as_tensor(value).requires_grad_(True)
        tl = torch.as_tensor(locs).requires_grad_(True)
        ta = torch.as_tensor(w).requires_grad_(True)
        out = core(tv, torch.as_tensor(np.asarray(SHAPES, dtype=np.int64)),
                   tl, ta)
        (out * out).sum().backward()
        np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(),
                                   rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(),
                                   rtol=1e-3, atol=1e-3)

    def test_zero_padding_outside(self, rng):
        value, locs, w = _random_inputs(rng, N=1, Lq=4, H=2, D=4, P=2)
        locs_far = np.full_like(locs, 5.0)  # all samples far outside
        out = np.asarray(deform_sample(
            jnp.asarray(value), SHAPES, jnp.asarray(locs_far), jnp.asarray(w)))
        np.testing.assert_allclose(out, 0.0, atol=1e-7)


def _copy_torch_linear(params, tmod, name):
    params[name]["kernel"] = jnp.asarray(
        tmod.weight.detach().numpy().T)
    params[name]["bias"] = jnp.asarray(tmod.bias.detach().numpy())


class TestProjAttnParity:
    @needs_ref
    @pytest.mark.parametrize("lq", [10, 33])
    @pytest.mark.slow
    def test_forward_matches_reference(self, rng, lq):
        import torch
        RefProjAttn = ref_projattn()
        d_model, n_heads, n_points, n_levels = 64, 4, 6, 1
        N = 3
        shapes = SHAPES
        torch.manual_seed(0)
        ref = RefProjAttn(d_model, n_levels, n_heads, n_points,
                          "ablation_not_use_rayconv").eval()

        src_views = [rng.randn(N, d_model, h, w).astype(np.float32)
                     for h, w in shapes]
        query = rng.randn(N, lq, d_model).astype(np.float32)
        refpts = rng.uniform(0.05, 0.95, size=(N, lq, 1, 2)).astype(np.float32)
        # the decoder's per-level S/(S-1) expansion (dq_decoder.py:570-573)
        shp = np.asarray(shapes, dtype=np.float32)
        wh = shp[:, ::-1]  # (L, 2) = (w, h)
        refpts_expand = refpts * wh / (wh - 1.0)

        src_views_nhwc = [np.transpose(s, (0, 2, 3, 1)) for s in src_views]
        mod = ProjAttn(d_model=d_model, n_levels=n_levels, n_heads=n_heads,
                       n_points=n_points)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(query),
                          jnp.asarray(refpts_expand),
                          [jnp.asarray(s) for s in src_views_nhwc], shapes)
        params = jax.tree_util.tree_map(lambda x: x, params)  # mutable copy
        p = params["params"]
        _copy_torch_linear(p, ref.sampling_offsets, "sampling_offsets")
        _copy_torch_linear(p, ref.attention_weights, "attention_weights")
        _copy_torch_linear(p, ref.rayconv, "rayconv")
        _copy_torch_linear(p, ref.output_proj, "output_proj")

        ours = np.asarray(mod.apply(
            params, jnp.asarray(query), jnp.asarray(refpts_expand),
            [jnp.asarray(s) for s in src_views_nhwc], shapes))

        with torch.no_grad():
            theirs = ref(
                torch.as_tensor(query),
                torch.as_tensor(refpts_expand),
                [torch.as_tensor(s) for s in src_views],
                None,
                torch.as_tensor(np.asarray(shapes, dtype=np.int64)),
                torch.as_tensor(np.asarray(
                    [0, shapes[0][0] * shapes[0][1],
                     shapes[0][0] * shapes[0][1] + shapes[1][0] * shapes[1][1]],
                    dtype=np.int64)),
                None,
            ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

    def test_default_init_offsets_bias_radial(self):
        """Fresh init reproduces the radial-grid bias (projattn.py:96-107)."""
        from mvgformer_tpu.ops.projattn import radial_offsets_bias_init
        bias = np.asarray(radial_offsets_bias_init(4, 2, 3)(
            None, (4 * 2 * 3 * 2,))).reshape(4, 2, 3, 2)
        # head 0 points along +x scaled by point index, both levels
        for lvl in range(2):
            np.testing.assert_allclose(bias[0, lvl, :, 0], [1, 2, 3],
                                       atol=1e-5)
            np.testing.assert_allclose(bias[0, lvl, :, 1], [0, 0, 0],
                                       atol=1e-5)
        # head 1 of 4 is at 90 deg: +y scaled by point index
        np.testing.assert_allclose(bias[1, 0, :, 0], [0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(bias[1, 0, :, 1], [1, 2, 3], atol=1e-5)

        # module-level: kernel zero, bias matches, for the live n_levels=1
        mod = ProjAttn(d_model=32, n_levels=1, n_heads=4, n_points=3)
        shapes = ((4, 6),)
        params = mod.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 5, 32)),
            jnp.zeros((1, 5, 1, 2)),
            [jnp.zeros((1, 4, 6, 32))], shapes)
        assert np.all(np.asarray(
            params["params"]["sampling_offsets"]["kernel"]) == 0)
        got = np.asarray(params["params"]["sampling_offsets"]["bias"])
        want = np.asarray(radial_offsets_bias_init(4, 1, 3)(None, (24,)))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestCornerTableSampler:
    """The fast 4-corner-table path must match the reference gather path
    bit-for-bit (both exact bilinear with zero padding)."""

    def test_matches_simple_impl(self, rng):
        from mvgformer_tpu.ops.sampling import deform_sample_corner
        value, locs, w = _random_inputs(rng, N=2, Lq=20, H=4, D=8, P=4)
        a = np.asarray(deform_sample(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        b = np.asarray(deform_sample_corner(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_matches_on_edges_and_outside(self, rng):
        from mvgformer_tpu.ops.sampling import deform_sample_corner
        value, locs, w = _random_inputs(rng, N=1, Lq=16, H=2, D=4, P=4)
        # cluster samples at image borders and outside
        locs = rng.uniform(-0.4, 1.4, size=locs.shape).astype(np.float32)
        a = np.asarray(deform_sample(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        b = np.asarray(deform_sample_corner(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_gradients_match(self, rng):
        from mvgformer_tpu.ops.sampling import deform_sample_corner
        value, locs, w = _random_inputs(rng, N=1, Lq=6, H=2, D=4, P=3)

        def loss(fn, v, l, a):
            return jnp.sum(fn(v, SHAPES, l, a) ** 2)

        ga = jax.grad(lambda v, l, a: loss(
            lambda *x: deform_sample(*x), v, l, a), argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        gb = jax.grad(lambda v, l, a: loss(
            lambda *x: deform_sample_corner(*x), v, l, a), argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-4)


class TestPallasKernel:
    def test_matches_reference_impl_interpret(self, rng):
        """Pallas corner-table kernel == jnp reference (interpret mode)."""
        from mvgformer_tpu.ops.pallas_deform import deform_sample_pallas

        value, locs, w = _random_inputs(rng, N=1, Lq=8, H=2, D=8, P=3)
        a = np.asarray(deform_sample(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        b = np.asarray(deform_sample_pallas(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w),
            interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


class TestUnstackedProductionPath:
    """The per-(view, head) grouped-table production path (size gate
    N*H*Lq*P >= 262144) must match the simple gather implementation —
    the small-shape tests above never cross the gate, so this is the only
    coverage of the standalone-table/grouped-level code."""

    def test_matches_simple_impl_at_gate(self, rng):
        from mvgformer_tpu.ops.sampling import deform_sample_corner

        # 2 * 4 * 1024 * 8 = 65536 * 4 = 262144: exactly at the gate
        value, locs, w = _random_inputs(rng, N=2, Lq=1024, H=4, D=8, P=8)
        a = np.asarray(deform_sample(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        b = np.asarray(deform_sample_corner(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_pallas_table_impl_matches(self, rng, monkeypatch):
        """MVG_TABLE_IMPL=pallas (padded-stride kernel tables,
        ops/table_pallas.py) must be bit-compatible with the XLA-table
        production path — the tables hold identical rows, only the row
        stride differs."""
        from mvgformer_tpu.ops.sampling import deform_sample_corner

        value, locs, w = _random_inputs(rng, N=2, Lq=1024, H=4, D=8, P=8)
        args = (jnp.asarray(value), SHAPES, jnp.asarray(locs),
                jnp.asarray(w))
        a = np.asarray(deform_sample_corner(*args))
        monkeypatch.setenv("MVG_TABLE_IMPL", "pallas")
        b = np.asarray(deform_sample_corner(*args))
        np.testing.assert_array_equal(a, b)

    def test_query_chunked_matches(self, rng):
        """query_chunks (TRAIN.SAMPLE_CHUNKS) splits only the query
        axis; per-query reductions are untouched, so the forward is
        bit-exact and gradients match the single-gather path."""
        from mvgformer_tpu.ops.sampling import deform_sample_corner

        value, locs, w = _random_inputs(rng, N=2, Lq=1024, H=4, D=8, P=8)
        args = (jnp.asarray(value), SHAPES, jnp.asarray(locs),
                jnp.asarray(w))
        a = np.asarray(deform_sample_corner(*args))
        b = np.asarray(deform_sample_corner(*args, query_chunks=8))
        np.testing.assert_array_equal(a, b)

        def loss(chunks, v, l, aw):
            return jnp.sum(deform_sample_corner(
                v, SHAPES, l, aw, query_chunks=chunks) ** 2)

        ga = jax.grad(loss, argnums=(1, 2, 3))(
            None, jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        gb = jax.grad(loss, argnums=(1, 2, 3))(
            8, jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-5)

    def test_pallas_table_impl_grad(self, rng, monkeypatch):
        """Gradients flow through the kernel build's custom VJP and
        match the XLA-table path."""
        from mvgformer_tpu.ops.sampling import deform_sample_corner

        value, locs, w = _random_inputs(rng, N=2, Lq=1024, H=4, D=8, P=8)

        def loss(v, l, a):
            return jnp.sum(deform_sample_corner(v, SHAPES, l, a) ** 2)

        ga = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        monkeypatch.setenv("MVG_TABLE_IMPL", "pallas")
        gb = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-5)


class TestPointTopM:
    """DECODER.inference_point_topm: per-(query, head, level) top-m point
    sparsification with global weight renormalization (projattn.py)."""

    def _build(self, rng, n_points=6):
        d_model, n_heads, n_levels = 32, 4, 1
        N, Lq = 2, 9
        src_views = [rng.randn(N, h, w, d_model).astype(np.float32)
                     for h, w in SHAPES]
        query = rng.randn(N, Lq, d_model).astype(np.float32)
        refpts = rng.uniform(0.05, 0.95,
                             size=(N, Lq, 3, 2)).astype(np.float32)
        mod = ProjAttn(d_model=d_model, n_levels=n_levels, n_heads=n_heads,
                       n_points=n_points)
        args = (jnp.asarray(query), jnp.asarray(refpts),
                [jnp.asarray(s) for s in src_views], SHAPES)
        params = mod.init(jax.random.PRNGKey(0), *args)
        # randomize the attention-weights linear so softmax weights are
        # distinct (fresh init is uniform -> top-k ties are ambiguous)
        p = jax.tree_util.tree_map(np.asarray, params)
        p["params"]["attention_weights"]["kernel"] = rng.randn(
            *p["params"]["attention_weights"]["kernel"].shape
        ).astype(np.float32)
        return mod, p, args

    def test_selected_weights_and_locations(self, rng):
        """The sown (weights, locations) under top-m are exactly the top-m
        rows of the full run, renormalized over (level, point)."""
        mod, params, args = self._build(rng)
        m = 2
        _, full = mod.apply(params, *args, mutable=["intermediates"])
        _, sel = mod.apply(params, *args, point_topm=m,
                           mutable=["intermediates"])
        w_full = np.asarray(
            full["intermediates"]["sampling_weights"][0])  # (N,Lq,H,L,P)
        loc_full = np.asarray(full["intermediates"]["sampling_locations"][0])
        w_sel = np.asarray(sel["intermediates"]["sampling_weights"][0])
        loc_sel = np.asarray(sel["intermediates"]["sampling_locations"][0])
        assert w_sel.shape[-1] == m and loc_sel.shape[-2] == m

        order = np.argsort(-w_full, axis=-1)[..., :m]
        w_top = np.take_along_axis(w_full, order, axis=-1)
        kept = w_top.sum(axis=(-2, -1), keepdims=True)
        np.testing.assert_allclose(w_sel, w_top / kept, rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(
            loc_sel, np.take_along_axis(loc_full, order[..., None], axis=4),
            rtol=1e-6, atol=1e-7)

    def test_peaked_weights_topm1_matches_full(self, rng):
        """With near-delta attention weights, top-1 sparsification must
        reproduce the full output (the dropped mass is negligible)."""
        mod, params, args = self._build(rng)
        # huge bias on one (head, level, point) slot per head -> softmax
        # mass ~1 on a single point
        b = params["params"]["attention_weights"]["bias"]
        b = np.full_like(np.asarray(b), -30.0)
        H, L, P = 4, 3, 6
        b = b.reshape(H, 1, P)  # wdim = H * n_levels * P, n_levels=1
        b[:, :, 2] = 30.0
        params["params"]["attention_weights"]["bias"] = b.reshape(-1)
        params["params"]["attention_weights"]["kernel"] = np.zeros_like(
            np.asarray(params["params"]["attention_weights"]["kernel"]))
        out_full = np.asarray(mod.apply(params, *args))
        out_m1 = np.asarray(mod.apply(params, *args, point_topm=1))
        np.testing.assert_allclose(out_m1, out_full, rtol=1e-4, atol=1e-5)

    def test_topm_equal_p_is_noop(self, rng):
        mod, params, args = self._build(rng)
        out_full = np.asarray(mod.apply(params, *args))
        out_p = np.asarray(mod.apply(params, *args, point_topm=6))
        np.testing.assert_allclose(out_p, out_full, rtol=0, atol=0)
