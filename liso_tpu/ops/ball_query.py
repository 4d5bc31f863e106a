"""Fixed-K radius neighbor query via a sorted cell-hash grid.

TPU-native replacement for the PointNet++ CUDA ``ball_query`` the
reference's PointRCNN consumes through mmdet3d set-abstraction layers
(liso/networks/simple_net/point_rcnn.py:28-80): instead of per-point
dynamic neighbor lists, points are bucketed into radius-sized BEV cells by
one sort on cell id, and every query scans its 3x3 cell neighborhood (a
superset of the radius-r disk) with a fixed per-cell candidate budget.
Everything is static-shape: sort + searchsorted + gathers + one top_k, so
it compiles to dense XLA ops with no data-dependent control flow.

Unlike CUDA ball_query (which returns an arbitrary first-K inside the
radius), ties are resolved by distance: the K NEAREST in-radius neighbors
are returned, which is strictly more informative for the grouping MLP.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e9


@partial(
    jax.jit,
    static_argnames=("radius", "k", "bev_range_m", "cap"),
)
def grid_ball_query(
    points: jnp.ndarray,  # [N, >=3]
    valid: jnp.ndarray,  # [N] bool
    *,
    radius: float,
    k: int,
    bev_range_m=(100.0, 100.0),
    cap: int | None = None,
):
    """-> (idx [N, k] int32 into the input cloud, mask [N, k] bool).

    Neighbors are the k nearest points with planar cell distance <= 1 cell
    and 3D distance <= radius (self included). Queries/candidates outside
    `valid` or the BEV range produce mask=False slots. `cap` bounds the
    candidates drawn per cell; it defaults to max(2*k, 16) so the top_k
    over 9*cap candidates actually sees the k nearest points even in
    dense cells (a cap == k would return an arbitrary per-cell prefix in
    cells holding more than k points)."""
    if cap is None:
        cap = max(2 * k, 16)
    n = points.shape[0]
    xyz = points[:, :3]
    hx = 0.5 * float(bev_range_m[0])
    hy = 0.5 * float(bev_range_m[1])
    W = max(int(2.0 * hx / radius + 0.5), 1)
    H = max(int(2.0 * hy / radius + 0.5), 1)

    col = jnp.floor((xyz[:, 0] + hx) / radius).astype(jnp.int32)
    row = jnp.floor((xyz[:, 1] + hy) / radius).astype(jnp.int32)
    in_grid = (col >= 0) & (col < W) & (row >= 0) & (row < H) & valid
    cid = jnp.where(
        in_grid, row * W + col, H * W
    )  # invalid/off-grid -> overflow bucket (never scanned)

    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    sorted_xyz = xyz[order]
    starts = jnp.searchsorted(sorted_cid, jnp.arange(H * W + 1))

    # 3x3 neighborhood cell ids per query
    dr = jnp.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.int32)
    dc = jnp.asarray([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.int32)
    nr = row[:, None] + dr[None, :]  # [N, 9]
    nc = col[:, None] + dc[None, :]
    cell_ok = (
        (nr >= 0) & (nr < H) & (nc >= 0) & (nc < W) & in_grid[:, None]
    )
    ncid = jnp.where(cell_ok, nr * W + nc, 0)
    s0 = starts[ncid]  # [N, 9]
    cnt = jnp.minimum(starts[ncid + 1] - s0, cap)
    cnt = jnp.where(cell_ok, cnt, 0)

    j = jnp.arange(cap, dtype=jnp.int32)
    cand = jnp.clip(s0[..., None] + j, 0, n - 1)  # [N, 9, cap] sorted idx
    in_bucket = j[None, None, :] < cnt[..., None]

    cand_xyz = sorted_xyz[cand]  # [N, 9, cap, 3]
    d2 = jnp.sum((cand_xyz - xyz[:, None, None, :]) ** 2, axis=-1)
    ok = in_bucket & (d2 <= radius * radius)
    key = jnp.where(ok, d2, _BIG).reshape(n, 9 * cap)
    neg_key, pos = jax.lax.top_k(-key, k)  # k smallest d2
    flat_cand = cand.reshape(n, 9 * cap)
    idx_sorted = jnp.take_along_axis(flat_cand, pos, axis=1)
    idx = order[idx_sorted].astype(jnp.int32)
    mask = -neg_key < _BIG * 0.5
    return idx, mask
