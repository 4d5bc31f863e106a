"""BEV grid setup shared by every module
(reference: liso/utils/bev_utils.py:5-64, liso/utils/bev_flow_utils.py:6-77).

Grid convention (identical to reference): grid is [H, W] with rows <-> x and
cols <-> y; the metric extent is symmetric about the sensor,
x in [-bev_range_m[0]/2, +bev_range_m[0]/2], y likewise. Voxel centers sit at
(idx + 0.5) * resolution + extent_min.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class BevSetup(NamedTuple):
    bev_range_m: Tuple[float, float]
    grid_size: Tuple[int, int]

    @property
    def res_m(self):
        return (
            self.bev_range_m[0] / self.grid_size[0],
            self.bev_range_m[1] / self.grid_size[1],
        )

    @property
    def extent_min(self):
        return (-0.5 * self.bev_range_m[0], -0.5 * self.bev_range_m[1])

    @property
    def num_cells(self) -> int:
        return self.grid_size[0] * self.grid_size[1]


def voxel_center_coords(setup: BevSetup) -> np.ndarray:
    """[H, W, 2] metric (x, y) of every cell center
    (reference get_voxel_center_coords_m)."""
    h, w = setup.grid_size
    ij = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1) + 0.5
    res = np.array(setup.res_m)
    return (ij * res + np.array(setup.extent_min)).astype(np.float32)


def point_cell_ids(
    pts_xy: jnp.ndarray,
    setup: BevSetup,
    valid: jnp.ndarray | None = None,
):
    """Map [..., N, 2] metric xy to flat cell id in [0, H*W]; id == H*W is the
    drop bucket for out-of-range or invalid points.

    Returns (cell_id int32 [..., N], in_range bool [..., N],
             rowcol int32 [..., N, 2]).
    """
    h, w = setup.grid_size
    res = jnp.asarray(setup.res_m, pts_xy.dtype)
    emin = jnp.asarray(setup.extent_min, pts_xy.dtype)
    rc_f = (pts_xy - emin) / res
    rc = jnp.floor(rc_f).astype(jnp.int32)
    in_range = (
        (rc[..., 0] >= 0) & (rc[..., 0] < h) & (rc[..., 1] >= 0) & (rc[..., 1] < w)
    )
    if valid is not None:
        in_range = in_range & valid
    rc = jnp.clip(rc, 0, jnp.asarray([h - 1, w - 1]))
    cell = rc[..., 0] * w + rc[..., 1]
    cell = jnp.where(in_range, cell, h * w)
    return cell, in_range, rc


def gather_bev_map_at_points(
    bev_map: jnp.ndarray, pts_xy: jnp.ndarray, setup: BevSetup
) -> jnp.ndarray:
    """Nearest-cell gather of a [H, W, C] map at [..., N, 2] metric points
    (reference HeadDecoder.apply_flow_to_points grid->point gather)."""
    h, w = setup.grid_size
    cell, in_range, _ = point_cell_ids(pts_xy, setup)
    flat = bev_map.reshape(h * w, -1)
    vals = flat[jnp.clip(cell, 0, h * w - 1)]
    return jnp.where(in_range[..., None], vals, 0.0)


def bilinear_sample_2d(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img [H, W, C] at pixel coords [..., 2] (row, col),
    align_corners=True semantics clamped at borders (reference
    raft_code/utils.py:bilinear_sampler via grid_sample)."""
    h, w = img.shape[:2]
    r = jnp.clip(coords[..., 0], 0.0, h - 1.0)
    c = jnp.clip(coords[..., 1], 0.0, w - 1.0)
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, h - 1)
    c1 = jnp.minimum(c0 + 1, w - 1)
    fr = (r - r0)[..., None]
    fc = (c - c0)[..., None]
    v00 = img[r0, c0]
    v01 = img[r0, c1]
    v10 = img[r1, c0]
    v11 = img[r1, c1]
    return (
        v00 * (1 - fr) * (1 - fc)
        + v01 * (1 - fr) * fc
        + v10 * fr * (1 - fc)
        + v11 * fr * fc
    )
