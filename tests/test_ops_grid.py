import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liso_tpu.ops import pillars, scatter
from liso_tpu.ops.bev import BevSetup, bilinear_sample_2d, point_cell_ids, voxel_center_coords
from liso_tpu.ops.knn import nn_1

SETUP = BevSetup(bev_range_m=(8.0, 8.0), grid_size=(4, 4))


class TestBev:
    def test_cell_ids(self):
        pts = jnp.array(
            [
                [-3.9, -3.9],  # cell (0, 0)
                [3.9, 3.9],  # cell (3, 3)
                [0.1, -0.1],  # cell (2, 1)
                [5.0, 0.0],  # out of range
            ]
        )
        cid, ok, rc = point_cell_ids(pts, SETUP)
        assert np.asarray(cid).tolist() == [0, 15, 9, 16]
        assert np.asarray(ok).tolist() == [True, True, True, False]

    def test_voxel_centers(self):
        vc = voxel_center_coords(SETUP)
        assert vc.shape == (4, 4, 2)
        np.testing.assert_allclose(vc[0, 0], [-3.0, -3.0])
        np.testing.assert_allclose(vc[3, 3], [3.0, 3.0])

    def test_bilinear_sample(self):
        img = jnp.arange(16.0).reshape(4, 4, 1)
        v = bilinear_sample_2d(img, jnp.array([1.5, 1.5]))
        # mean of cells (1,1),(1,2),(2,1),(2,2) = mean(5,6,9,10) = 7.5
        np.testing.assert_allclose(v, [7.5])


class TestScatter:
    def test_mean_and_max(self):
        vals = jnp.array([[1.0], [3.0], [10.0], [99.0]])
        cid = jnp.array([0, 0, 2, 16])  # 16 = drop bucket
        mean, cnt = scatter.scatter_mean_grid(vals, cid, 16)
        assert mean[0, 0] == 2.0 and mean[2, 0] == 10.0
        mx = scatter.scatter_max_grid(vals, cid, 16, fill=-1.0)
        assert mx[0, 0] == 3.0 and mx[1, 0] == -1.0


class TestPillars:
    def test_pillarize_and_scatter(self):
        pts = jnp.array(
            [
                [-3.0, -3.0, 0.0, 0.5],
                [-2.9, -3.1, 0.2, 0.1],
                [3.0, 3.0, 9.0, 0.0],  # z beyond cutoff
                [0.0, 0.0, 0.0, 0.0],  # padded-out
            ]
        )
        valid = jnp.array([True, True, True, False])
        cid, inp = pillars.pillarize(pts, valid, SETUP, z_cutoff=5.0)
        assert np.asarray(inp).tolist() == [True, True, False, False]
        feats = pillars.pillar_point_features(pts, cid, inp, SETUP)
        assert feats.shape == (4, 4 + 5)
        # cluster offset of first two points: mean z = 0.1
        np.testing.assert_allclose(feats[0, 6], -0.1, atol=1e-6)
        grid = pillars.scatter_pillars_to_bev(
            jnp.where(inp[:, None], feats, 0.0), cid, SETUP
        )
        assert grid.shape == (4, 4, 9)
        occ = pillars.occupancy_map(cid, inp, SETUP)
        assert float(occ.sum()) == 1.0  # both valid points share cell (0,0)
        assert occ[0, 0, 0] == 1.0


class TestKnn:
    def test_vs_scipy(self):
        from scipy.spatial import cKDTree

        rng = np.random.RandomState(0)
        refs = rng.randn(500, 3).astype(np.float32)
        qs = rng.randn(300, 3).astype(np.float32)
        d, i = nn_1(
            jnp.asarray(qs), jnp.asarray(refs),
            jnp.ones(300, bool), jnp.ones(500, bool), chunk=128,
        )
        tree = cKDTree(refs)
        d_ref, i_ref = tree.query(qs, k=1)
        np.testing.assert_array_equal(np.asarray(i), i_ref)
        np.testing.assert_allclose(np.sqrt(np.asarray(d)), d_ref, atol=1e-3)

    def test_masks(self):
        refs = jnp.array([[0.0, 0, 0], [100.0, 0, 0]])
        qs = jnp.array([[99.0, 0, 0], [1.0, 0, 0]])
        d, i = nn_1(qs, refs, jnp.array([True, False]),
                    jnp.array([True, False]), chunk=2)
        assert int(i[0]) == 0  # ref 1 invalid -> picks ref 0
        assert d[1] >= 1e8  # invalid query


class TestGridScatterPallas:
    """Interpret-mode checks of the MXU one-hot scatter/gather kernels
    (liso_tpu/ops/grid_scatter_pallas.py); compiled-path exactness is
    verified on real TPU hardware against jax.ops.segment_* (same seeds)."""

    def _data(self, B=2, N=512, NC=1024, C=16):
        rng = np.random.RandomState(3)
        cells = np.sort(rng.randint(0, NC + 1, (B, N)).astype(np.int32), -1)
        feats = rng.randn(B, N, C).astype(np.float32)
        return jnp.asarray(cells), jnp.asarray(feats), NC

    def test_reduce_add_max_vs_segment_ops(self):
        from liso_tpu.ops.grid_scatter_pallas import grid_reduce

        cells, feats, NC = self._data()
        for op in ("add", "max"):
            got = grid_reduce(feats, cells, NC, op, True)
            if op == "add":
                want = jax.vmap(
                    lambda f, c: jax.ops.segment_sum(f, c, num_segments=NC + 1)
                )(feats, cells)[:, :NC]
            else:
                want = jax.vmap(
                    lambda f, c: jax.ops.segment_max(f, c, num_segments=NC + 1)
                )(feats, cells)[:, :NC]
                want = jnp.where(jnp.isneginf(want), 0.0, want)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_reduce_add_scalar_channel_path(self):
        """C == 1 routes through the lane-packed kernel (_reduce_kernel_c1):
        the generic block would lane-pad [N, 1] -> [N, 128] and OOM VMEM at
        the MovAvg histogram's N = 131k (regression: slim train step at
        512^2 failed to compile). Exactness vs segment_sum, including the
        int32-max drop bucket and an all-dropped batch row."""
        from liso_tpu.ops.grid_scatter_pallas import grid_reduce

        rng = np.random.RandomState(7)
        B, N, NC = 3, 2048, 2048  # N not a _K multiple after the drop rows
        cells = np.sort(rng.randint(0, NC + 1, (B, N)).astype(np.int32), -1)
        cells[cells >= NC] = np.iinfo(np.int32).max
        cells[2, :] = np.iinfo(np.int32).max  # whole sample dropped
        vals = rng.randn(B, N, 1).astype(np.float32)
        got = grid_reduce(jnp.asarray(vals), jnp.asarray(cells), NC, "add", True)
        safe = np.minimum(cells, NC)  # segment_sum wants small ids
        want = jax.vmap(
            lambda f, c: jax.ops.segment_sum(f, c, num_segments=NC + 1)
        )(jnp.asarray(vals), jnp.asarray(safe))[:, :NC]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert float(np.abs(np.asarray(got[2])).sum()) == 0.0

    def test_reduce_with_occ_matches_reduce_plus_count(self):
        """grid_reduce_with_occ: the occupancy output must equal a
        separate count-based occupancy (the kernel derives it from the
        same one-hot masks), the grid must equal plain grid_reduce, and
        the VJP must match grid_reduce's (occ cotangent dropped)."""
        from liso_tpu.ops.grid_scatter_pallas import (
            grid_reduce, grid_reduce_with_occ,
        )

        cells, feats, NC = self._data()
        for op in ("add", "max"):
            got, occ = grid_reduce_with_occ(feats, cells, NC, op, True)
            want = grid_reduce(feats, cells, NC, op, True)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
            cnt = jax.vmap(
                lambda c: jax.ops.segment_sum(
                    jnp.ones_like(c, jnp.float32), c, num_segments=NC + 1
                )
            )(cells)[:, :NC]
            np.testing.assert_array_equal(
                np.asarray(occ[..., 0]), (np.asarray(cnt) > 0).astype(np.float32)
            )

        def f_occ(x):
            g, _ = grid_reduce_with_occ(x, cells, NC, "max", True)
            return jnp.sum(g ** 2)

        def f_ref(x):
            return jnp.sum(grid_reduce(x, cells, NC, "max", True) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(f_occ)(feats)),
            np.asarray(jax.grad(f_ref)(feats)),
            rtol=1e-5, atol=1e-5,
        )

    def test_non_tile_divisible_cell_count(self):
        """Grids whose cell count is not a tile multiple (the reference's
        920^2 = 846400) are handled by PADDING the cell rows, not by
        shrinking the tile: reduce slices the pad off, gather pads the
        grid with zeros so drop-bucket ids read 0."""
        from liso_tpu.ops.grid_scatter_pallas import (
            grid_gather, grid_reduce, grid_reduce_with_occ,
        )

        rng = np.random.RandomState(11)
        B, N, NC = 2, 640, 900  # 900 not divisible by any pow2 tile
        cells = np.sort(rng.randint(0, NC + 1, (B, N)).astype(np.int32), -1)
        feats = rng.randn(B, N, 8).astype(np.float32)
        cells_j, feats_j = jnp.asarray(cells), jnp.asarray(feats)
        for op in ("add", "max"):
            got = grid_reduce(feats_j, cells_j, NC, op, True)
            assert got.shape == (B, NC, 8)
            fn = jax.ops.segment_sum if op == "add" else jax.ops.segment_max
            want = jax.vmap(
                lambda f, c: fn(f, c, num_segments=NC + 1)
            )(feats_j, cells_j)[:, :NC]
            if op == "max":
                want = jnp.where(jnp.isneginf(want), 0.0, want)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        (g, occ) = grid_reduce_with_occ(feats_j, cells_j, NC, "max", True)
        assert g.shape == (B, NC, 8) and occ.shape == (B, NC, 1)
        grid = jnp.asarray(rng.randn(B, NC, 8).astype(np.float32))
        gat = grid_gather(grid, cells_j, True)
        assert gat.shape == (B, N, 8)
        drop = cells >= NC  # drop bucket must gather exactly 0
        np.testing.assert_array_equal(np.asarray(gat)[drop], 0.0)
        safe = np.minimum(cells, NC - 1)
        want = np.take_along_axis(np.asarray(grid), safe[..., None], 1)
        np.testing.assert_allclose(
            np.asarray(gat)[~drop], want[~drop], rtol=1e-6, atol=1e-6
        )

    def test_gather_and_vjps_match_autodiff(self):
        from liso_tpu.ops.grid_scatter_pallas import grid_gather, grid_reduce

        cells, feats, NC = self._data()
        B, N, C = feats.shape
        rng = np.random.RandomState(4)
        grid = jnp.asarray(rng.randn(B, NC, C).astype(np.float32))
        got = grid_gather(grid, cells, True)
        want = jax.vmap(
            lambda g, c: jnp.where(
                (c < NC)[:, None], g[jnp.clip(c, 0, NC - 1)], 0.0
            )
        )(grid, cells)
        np.testing.assert_allclose(got, want, rtol=1e-6)

        # adjoints: reduce-add bwd == gather fwd; gather bwd == reduce-add
        g_out = jnp.asarray(rng.randn(B, NC, C).astype(np.float32))
        _, vjp = jax.vjp(lambda f: grid_reduce(f, cells, NC, "add", True), feats)
        (df,) = vjp(g_out)
        np.testing.assert_allclose(df, grid_gather(g_out, cells, True), rtol=1e-5)

        g_pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        _, vjp = jax.vjp(lambda gr: grid_gather(gr, cells, True), grid)
        (dg,) = vjp(g_pts)
        np.testing.assert_allclose(
            dg, grid_reduce(g_pts, cells, NC, "add", True), rtol=1e-5
        )

    def test_reduce_max_vjp_routes_to_argmax(self):
        from liso_tpu.ops.grid_scatter_pallas import grid_reduce

        cells, feats, NC = self._data(B=1, N=256, NC=512, C=8)
        g = jnp.ones((1, NC, 8), jnp.float32)
        _, vjp = jax.vjp(lambda f: grid_reduce(f, cells, NC, "max", True), feats)
        (df,) = vjp(g)
        _, rvjp = jax.vjp(
            lambda f: jnp.where(
                jnp.isneginf(
                    jax.vmap(
                        lambda fi, ci: jax.ops.segment_max(
                            fi, ci, num_segments=NC + 1
                        )
                    )(f, cells)[:, :NC]
                ),
                0.0,
                jax.vmap(
                    lambda fi, ci: jax.ops.segment_max(fi, ci, num_segments=NC + 1)
                )(f, cells)[:, :NC],
            ),
            feats,
        )
        (rdf,) = rvjp(g)
        np.testing.assert_allclose(df, rdf, rtol=1e-5, atol=1e-5)


class TestKnnPallas:
    """x-band-pruned 1-NN kernel (ops/knn_pallas.py) in interpret mode;
    compiled exactness vs scipy verified on TPU (99.98% of neighbours,
    remainder = beyond-margin outliers)."""

    def _clouds(self, B=2, Nq=768, Nr=6144, r_valid_frac=0.5):
        """Cell-style clouds: valid points x-sorted FIRST, invalid points
        at the TAIL (how ops/knn.py sorts by cell id — invalid points get
        the drop-bucket id). With r_valid_frac=0.5 and Nr=6144 (_RT=1024)
        the last ~3 ref tiles are fully invalid, exercising the trailing
        empty-tile sentinel path that regressed in round 1 (ADVICE high)."""
        rng = np.random.RandomState(1)

        def sc(n, n_valid):
            pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
            pts[:n_valid] = pts[:n_valid][np.argsort(pts[:n_valid, 0])]
            valid = np.zeros(n, bool)
            valid[:n_valid] = True
            return pts, valid

        nq_valid = Nq - 5
        nr_valid = int(Nr * r_valid_frac)
        qs, rs = [sc(Nq, nq_valid) for _ in range(B)], [
            sc(Nr, nr_valid) for _ in range(B)
        ]
        q = np.stack([p for p, _ in qs])
        qv = np.stack([v for _, v in qs])
        r = np.stack([p for p, _ in rs])
        rv = np.stack([v for _, v in rs])
        return q, qv, r, rv

    def test_matches_brute_force_within_margin(self):
        from liso_tpu.ops.knn_pallas import nn_1_sorted

        q, qv, r, rv = self._clouds()
        d, i = nn_1_sorted(
            jnp.asarray(q), jnp.asarray(r), jnp.asarray(qv),
            jnp.asarray(rv), interpret=True,
        )
        d_ref, i_ref = jax.vmap(
            lambda a, b, av, bv: nn_1(a, b, av, bv, chunk=256)
        )(jnp.asarray(q), jnp.asarray(r), jnp.asarray(qv), jnp.asarray(rv))
        d, i, d_ref, i_ref = map(np.asarray, (d, i, d_ref, i_ref))
        close = (d_ref < 8.0**2) & qv
        # dense clouds: nearly every valid query must have an in-margin NN,
        # and the kernel must find ALL of them (the round-1 regression
        # returned dist=1e9 for every query when trailing tiles were empty)
        assert close.sum() > 0.9 * qv.sum()
        np.testing.assert_array_equal(i[close], i_ref[close])
        np.testing.assert_allclose(d[close], d_ref[close], rtol=1e-3, atol=1e-3)
        assert (d[~qv] >= 1e8).all()  # invalid queries
        assert (~rv[np.arange(rv.shape[0])[:, None], i])[close].sum() == 0

    def test_all_refs_invalid_gives_big(self):
        from liso_tpu.ops.knn_pallas import nn_1_sorted

        q, qv, r, rv = self._clouds(B=1, Nq=256, Nr=2048)
        rv[:] = False
        d, _ = nn_1_sorted(
            jnp.asarray(q), jnp.asarray(r), jnp.asarray(qv),
            jnp.asarray(rv), interpret=True,
        )
        assert (np.asarray(d) >= 1e8).all()


class TestCorrLookupMM:
    """The TPU correlation lookup (ops/corr_lookup_mm.py) selects windows
    with one-hot MXU matmuls; one-hot selection of bf16 values is lossless,
    so on a bf16-quantized pyramid it must be (near) bit-identical to the
    gather-based models/raft.lookup_corr — for all coords, including far
    out-of-bounds (the per-tap clipping is folded into the selectors)."""

    def _pyramid_coords(self, B=2, H=12, W=16, C=32, seed=7):
        from liso_tpu.models.raft import build_corr_pyramid

        rng = np.random.RandomState(seed)
        f0 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        pyr = build_corr_pyramid(f0, f1, num_levels=3)
        # coords spanning in-bounds, edges, and far out-of-bounds
        coords = rng.uniform(-10.0, H + 10.0, (B, H, W, 2)).astype(np.float32)
        coords[..., 1] = rng.uniform(-10.0, W + 10.0, (B, H, W)).astype(
            np.float32
        )
        return pyr, jnp.asarray(coords)

    def test_mm_lookup_matches_gather_on_bf16_pyramid(self):
        from liso_tpu.models.raft import lookup_corr
        from liso_tpu.ops.corr_lookup_mm import (
            lookup_prepared_mm, prepare_corr_volumes_mm,
        )

        pyr, coords = self._pyramid_coords()
        prepared = prepare_corr_volumes_mm(pyr, radius=3)
        got = lookup_prepared_mm(prepared, coords, radius=3)
        want = lookup_corr(
            tuple(v.astype(jnp.float32) for v in prepared), coords, radius=3
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)

    def test_mm_lookup_volume_grad_matches_gather_grad(self):
        from liso_tpu.models.raft import lookup_corr
        from liso_tpu.ops.corr_lookup_mm import lookup_prepared_mm

        pyr, coords = self._pyramid_coords(B=1, H=8, W=8, C=16)
        pyr32 = tuple(v.astype(jnp.bfloat16).astype(jnp.float32) for v in pyr)

        def loss_mm(vols):
            vols16 = tuple(v.astype(jnp.bfloat16) for v in vols)
            return jnp.sum(lookup_prepared_mm(vols16, coords) ** 2)

        def loss_g(vols):
            return jnp.sum(lookup_corr(vols, coords) ** 2)

        g_mm = jax.grad(loss_mm)(pyr32)
        g_g = jax.grad(loss_g)(pyr32)
        for a, b in zip(g_mm, g_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-2, atol=1e-2)

    def test_pooled_fmap_pyramid_equals_pooled_volume(self):
        """corr is linear in fmap1: pooling fmap1 before the matmul must
        equal the reference's 2x2 average pooling of the corr volume
        (liso/slim/model/raft_code/corr.py:30-35)."""
        import flax.linen as fnn

        from liso_tpu.models.raft import build_corr_pyramid

        rng = np.random.RandomState(11)
        B, H, W, C = 2, 8, 8, 16
        f0 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        pyr = build_corr_pyramid(f0, f1, num_levels=3)
        # reference formulation: pool the level-0 volume's target dims
        lvl0 = pyr[0]  # [B, HW, H, W]
        want1 = fnn.avg_pool(
            lvl0[..., None], window_shape=(2, 2), strides=(2, 2)
        )[..., 0]
        np.testing.assert_allclose(
            np.asarray(pyr[1]), np.asarray(want1), rtol=1e-5, atol=1e-5
        )
        want2 = fnn.avg_pool(
            want1[..., None], window_shape=(2, 2), strides=(2, 2)
        )[..., 0]
        np.testing.assert_allclose(
            np.asarray(pyr[2]), np.asarray(want2), rtol=1e-5, atol=1e-5
        )


def test_bf16_volume_build_equals_posthoc_cast():
    """build_corr_pyramid(out_dtype=bf16) must equal casting the fp32
    pyramid afterwards (prepare_corr_volumes_mm) — the MXU-epilogue cast
    only moves WHERE the rounding happens, not the values."""
    from liso_tpu.models.raft import build_corr_pyramid
    from liso_tpu.ops.corr_lookup_mm import prepare_corr_volumes_mm

    rng = np.random.RandomState(3)
    f0 = jnp.asarray(rng.randn(2, 12, 16, 32).astype(np.float32))
    f1 = jnp.asarray(rng.randn(2, 12, 16, 32).astype(np.float32))
    direct = build_corr_pyramid(f0, f1, num_levels=3,
                                out_dtype=jnp.bfloat16)
    posthoc = prepare_corr_volumes_mm(
        build_corr_pyramid(f0, f1, num_levels=3)
    )
    assert len(direct) == len(posthoc)
    for a, b in zip(direct, posthoc):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_matmul_upsample_matches_gather_formulation():
    """The matmul upsample must equal the direct gather/lerp formulation of
    align_corners=True bilinear interpolation (reference F.interpolate)."""
    from liso_tpu.models.raft import upsample_bilinear

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 9, 3).astype(np.float32))
    n = 8
    got = upsample_bilinear(x, n)

    b, h, w, c = x.shape
    rows = np.linspace(0.0, h - 1.0, h * n)
    cols = np.linspace(0.0, w - 1.0, w * n)
    r0 = np.floor(rows).astype(int); r1 = np.minimum(r0 + 1, h - 1)
    c0 = np.floor(cols).astype(int); c1 = np.minimum(c0 + 1, w - 1)
    fr = (rows - r0)[None, :, None, None]
    fc = (cols - c0)[None, None, :, None]
    xn = np.asarray(x)
    top = xn[:, r0][:, :, c0] * (1 - fc) + xn[:, r0][:, :, c1] * fc
    bot = xn[:, r1][:, :, c0] * (1 - fc) + xn[:, r1][:, :, c1] * fc
    want = top * (1 - fr) + bot * fr
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    # endpoints land exactly on the input samples (align_corners)
    np.testing.assert_allclose(np.asarray(got)[:, 0, 0], xn[:, 0, 0],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got)[:, -1, -1], xn[:, -1, -1],
                               rtol=1e-6, atol=1e-6)
