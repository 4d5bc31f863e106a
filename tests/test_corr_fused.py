"""Fused corr-recompute lookup (ops/corr_fused_pallas) vs the materialized
paths: forward exact, gradients matching, RAFT integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liso_tpu.models.raft import build_corr_pyramid, lookup_corr
from liso_tpu.ops.corr_fused_pallas import (
    corr_window_features,
    fused_corr_window,
    pool_f1_levels,
)
from liso_tpu.ops.corr_lookup_mm import (
    lookup_prepared_mm,
    prepare_corr_volumes_mm,
)


def _fixtures(b=2, h=16, w=16, c=32, seed=0):
    """bf16-representable fmaps: in the mixed-precision model the encoder
    emits bf16 activations (cast to f32), so the fused kernel's bf16 input
    cast is lossless and its corr values are bit-identical to the mm path's
    f32-matmul-then-bf16-cast. (On raw f32 fmaps the fused path quantizes
    the INPUTS where the mm path quantizes the OUTPUT — both are bf16-level
    precision, just not bitwise-equal; see the f32 tolerance test.)"""
    rng = np.random.RandomState(seed)
    f0 = jnp.asarray(
        rng.randn(b, h, w, c).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    f1 = jnp.asarray(
        rng.randn(b, h, w, c).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    # coords spanning in-bounds, fractional, and far out-of-bounds
    coords = jnp.asarray(
        rng.uniform(-6, h + 6, (b, h, w, 2)).astype(np.float32)
    )
    return f0, f1, coords


def test_fused_forward_matches_mm_lookup():
    """Level 0 is BIT-EXACT vs the mm path (no pooling: bf16-representable
    inputs make every product exact; selection picks, never blends across
    taps beyond the bilinear weights both paths share). Pooled levels carry
    one extra bf16 rounding (pooled f1 is quantized before the matmul where
    the mm path quantizes the f32 corr output) — same error scale as the
    volume quantization both TPU paths already accept vs the f32 reference."""
    f0, f1, coords = _fixtures()
    pyramid = build_corr_pyramid(f0, f1, 4)
    ref = lookup_prepared_mm(prepare_corr_volumes_mm(pyramid), coords)

    f1cat, levels = pool_f1_levels(f1, 4)
    b, h, w, c = f0.shape
    out = corr_window_features(
        f0.reshape(b, h * w, c), f1cat, coords, levels
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out[..., :49]), np.asarray(ref[..., :49]), atol=2e-6
    )
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(
        np.asarray(out) / scale, np.asarray(ref) / scale, atol=2e-2
    )


def test_fused_forward_matches_gather_on_bf16_pyramid():
    f0, f1, coords = _fixtures(seed=3)
    pyramid = build_corr_pyramid(f0, f1, 4, out_dtype=jnp.bfloat16)
    ref = lookup_corr(pyramid, coords)
    f1cat, levels = pool_f1_levels(f1, 4)
    b, h, w, c = f0.shape
    out = corr_window_features(f0.reshape(b, h * w, c), f1cat, coords, levels)
    np.testing.assert_allclose(
        np.asarray(out[..., :49]), np.asarray(ref[..., :49]), atol=2e-6
    )
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(
        np.asarray(out) / scale, np.asarray(ref) / scale, atol=2e-2
    )


def test_fused_gradients_match_mm_path():
    f0, f1, coords = _fixtures(b=1, h=16, w=16, c=16, seed=1)
    cot = jnp.asarray(
        np.random.RandomState(2).randn(1, 16, 16, 4 * 49).astype(np.float32)
    )

    def loss_mm(f0_, f1_, coords_):
        pyr = build_corr_pyramid(f0_, f1_, 4)
        out = lookup_prepared_mm(prepare_corr_volumes_mm(pyr), coords_)
        return (out * cot).sum()

    def loss_fused(f0_, f1_, coords_):
        f1cat, levels = pool_f1_levels(f1_, 4)
        b, h, w, c = f0_.shape
        out = corr_window_features(
            f0_.reshape(b, h * w, c), f1cat, coords_, levels
        )
        return (out * cot).sum()

    g_mm = jax.grad(loss_mm, argnums=(0, 1, 2))(f0, f1, coords)
    g_fu = jax.grad(loss_fused, argnums=(0, 1, 2))(f0, f1, coords)
    for a, b_, name in zip(g_mm, g_fu, ("f0", "f1", "coords")):
        a, b_ = np.asarray(a), np.asarray(b_)
        denom = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(
            b_ / denom, a / denom, atol=2e-2, err_msg=name
        )


def test_fused_small_grid_levels_break():
    """Tiny grids truncate the pyramid exactly like build_corr_pyramid."""
    f0, f1, coords = _fixtures(b=1, h=6, w=6, c=8, seed=4)
    pyramid = build_corr_pyramid(f0, f1, 4)
    f1cat, levels = pool_f1_levels(f1, 4)
    assert len(levels.shapes) == len(pyramid)
    ref = lookup_prepared_mm(prepare_corr_volumes_mm(pyramid), coords)
    out = corr_window_features(f0.reshape(1, 36, 8), f1cat, coords, levels)
    np.testing.assert_allclose(
        np.asarray(out[..., :49]), np.asarray(ref[..., :49]), atol=2e-6
    )
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(
        np.asarray(out) / scale, np.asarray(ref) / scale, atol=2e-2
    )


def test_raft_fused_path_matches_gather_path(monkeypatch):
    """RAFT flow_from_features under LISO_CORR_PATH=fused equals the gather
    path on the same (bf16-quantized) correlation values."""
    from liso_tpu.models.raft import RAFT

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 32, 32, 8).astype(np.float32))
    raft = RAFT(num_iters=2, corr_levels=4)
    params = raft.init(jax.random.PRNGKey(0), img, img + 0.1)

    monkeypatch.setenv("LISO_CORR_PATH", "fused")
    out_fused = raft.apply(params, img, img + 0.1)
    monkeypatch.delenv("LISO_CORR_PATH")
    out_gather = raft.apply(params, img, img + 0.1)
    # gather path keeps the volume fp32; fused quantizes to bf16 — small
    # tolerance instead of exact
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_gather), atol=5e-2, rtol=1e-2
    )


@pytest.mark.parametrize("h", [4, 6, 8, 12, 16])
def test_fused_matches_gather_across_coarse_sizes(h):
    """Compile/correctness envelope sweep (VERDICT r4 weak #5: grid-32
    SLIM crashed Mosaic on small pyramid levels). Every coarse size down
    to the dryrun's 4x4 must produce gather-path values — small levels
    are zero-padded to Mosaic's minimum reshape tile inside
    pool_f1_levels/level_geometry, and taps landing in the pad read the
    reference's grid_sample zeros."""
    f0, f1, coords = _fixtures(b=2, h=h, w=h, c=16, seed=3)
    pyramid = build_corr_pyramid(f0, f1, 4)
    ref = lookup_corr(pyramid, coords)

    f1cat, levels = pool_f1_levels(f1, 4)
    assert len(levels.shapes) == len(pyramid)
    assert all(min(s) >= 8 for s in levels.shapes), levels
    b = f0.shape[0]
    out = corr_window_features(
        f0.reshape(b, h * h, 16), f1cat, coords, levels
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_fused_dryrun_shapes_grads_finite():
    """The exact shapes of the multi-chip dryrun (grid 32 -> coarse 4,
    batch 8): forward + backward through the padded-level kernel must be
    finite, and df1 for pad rows must be discarded by pool_f1_levels'
    pad VJP (checked via shape round-trip through grad)."""
    f0, f1, coords = _fixtures(b=8, h=4, w=4, c=16, seed=4)

    def loss(f0_, f1_):
        f1cat, levels = pool_f1_levels(f1_, 4)
        out = corr_window_features(
            f0_.reshape(8, 16, 16), f1cat, coords, levels
        )
        return jnp.sum(out**2)

    g0, g1 = jax.grad(loss, argnums=(0, 1))(f0, f1)
    assert g0.shape == f0.shape and g1.shape == f1.shape
    assert np.isfinite(np.asarray(g0)).all()
    assert np.isfinite(np.asarray(g1)).all()
