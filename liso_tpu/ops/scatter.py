"""Fixed-shape scatter ops onto BEV grids.

Replaces the reference's numpy scatter (liso/utils/numpy_scatter.py:4-26),
torch index_put_ scatter (liso/utils/torch_differentiable_forward_scatter.py),
and the mmdet3d PointPillarsScatter: on TPU we scatter straight into the dense
[H*W] grid with jax.ops.segment_* (XLA lowers these to efficient sorted
scatters), using a dedicated drop bucket for padded/out-of-range points so
shapes stay static. All ops are differentiable where the reference's were.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_add_grid(values: jnp.ndarray, cell_id: jnp.ndarray, num_cells: int):
    """values [N, C] or [N], cell_id [N] int32 in [0, num_cells] where
    num_cells is the drop bucket. Returns [num_cells, C]."""
    out = jax.ops.segment_sum(values, cell_id, num_segments=num_cells + 1)
    return out[:num_cells]


def scatter_mean_grid(
    values: jnp.ndarray, cell_id: jnp.ndarray, num_cells: int, eps: float = 1e-8
):
    s = jax.ops.segment_sum(values, cell_id, num_segments=num_cells + 1)
    cnt = jax.ops.segment_sum(jnp.ones_like(cell_id, jnp.float32), cell_id,
                              num_segments=num_cells + 1)
    if values.ndim == 2:
        cnt = cnt[:, None]
    return (s / jnp.maximum(cnt, eps))[:num_cells], cnt[:num_cells]


def scatter_max_grid(values: jnp.ndarray, cell_id: jnp.ndarray, num_cells: int,
                     fill: float = 0.0):
    """Segment max with `fill` in empty cells (reference PillarFeatureNet's
    per-pillar max pooling)."""
    out = jax.ops.segment_max(values, cell_id, num_segments=num_cells + 1)
    out = out[:num_cells]
    return jnp.where(jnp.isfinite(out), out, fill)


def gather_grid(grid: jnp.ndarray, cell_id: jnp.ndarray):
    """grid [num_cells, C], cell_id [N] (drop-bucket ids are clamped; caller
    masks). Inverse of scatter: per-point gather of BEV features."""
    safe = jnp.clip(cell_id, 0, grid.shape[0] - 1)
    return grid[safe]


def sorted_segment_totals(values: jnp.ndarray, cells: jnp.ndarray):
    """Per-point SEGMENT TOTAL for cell-sorted points, without touching the
    grid: values [B, N, C], cells [B, N] ascending -> [B, N, C] where every
    point carries the sum over its whole segment.

    Two log-depth segmented scans (associative_scan), no scatter/gather —
    on TPU both XLA scatter and row gathers serialize, so this is how the
    pillar cluster means (reference PillarFeatureNet x-xm features,
    pcl_to_feature_grid.py:40-47) are computed on-device.
    """
    start = jnp.concatenate(
        [jnp.ones_like(cells[:, :1], bool), cells[:, 1:] != cells[:, :-1]],
        axis=1,
    )
    flags = jnp.broadcast_to(start[..., None], values.shape)

    def seg_add(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    prefix, _ = jax.lax.associative_scan(seg_add, (values, flags), axis=1)

    # propagate each segment's LAST prefix value (the total) backwards:
    # reversed order makes segment-last elements segment-first
    last = jnp.concatenate(
        [cells[:, 1:] != cells[:, :-1], jnp.ones_like(cells[:, :1], bool)],
        axis=1,
    )
    rv = prefix[:, ::-1]
    rf = jnp.broadcast_to(last[..., None], values.shape)[:, ::-1]

    def hold_first(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va), fa | fb

    totals_rev, _ = jax.lax.associative_scan(hold_first, (rv, rf), axis=1)
    return totals_rev[:, ::-1]
