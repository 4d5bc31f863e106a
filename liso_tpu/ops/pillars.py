"""Fixed-capacity pillarization (TPU replacement for mmcv `Voxelization` +
mmdet3d `PillarFeatureNet`/`PointPillarsScatter` used at
liso/networks/pcl_to_feature_grid/pcl_to_feature_grid.py:24-54).

The CUDA path builds a sparse pillar list (max 40k pillars x 20 points); on
TPU we never materialise that: every (padded) point gets a flat BEV cell id
and all per-pillar statistics are segment reductions straight into the dense
[H*W] grid. This removes the dynamic-shape voxelizer entirely and makes the
whole encoder one fused XLA program.

Feature layout matches mmdet3d PillarFeatureNet (with_distance=False):
  raw point features [x, y, z, (intensity...)] ++
  cluster offsets    [x - xm, y - ym, z - zm]   (pillar mean)   ++
  center offsets     [x - xc, y - yc]           (pillar center)
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from liso_tpu.ops import scatter
from liso_tpu.ops.bev import BevSetup, point_cell_ids


def pillarize(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    setup: BevSetup,
    z_cutoff: float = 5.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """points [N, >=3], valid [N] -> (cell_id [N] in [0, H*W], in_pillar [N]).

    z cutoff replicates the reference's +-z_pillar_cutoff_value=5.0 pc_range
    (pcl_to_feature_grid.py:14-18).
    """
    z_ok = jnp.abs(points[..., 2]) < z_cutoff
    cell_id, in_range, _ = point_cell_ids(points[..., :2], setup, valid & z_ok)
    return cell_id, in_range


def pillar_point_features(
    points: jnp.ndarray,
    cell_id: jnp.ndarray,
    in_pillar: jnp.ndarray,
    setup: BevSetup,
) -> jnp.ndarray:
    """Build the 9/10-dim augmented per-point features [N, F+5].

    points [N, F>=3] (xyz + optional intensity channels).
    """
    num_cells = setup.num_cells
    xyz = points[..., :3]
    mean_xyz, _cnt = scatter.scatter_mean_grid(xyz, cell_id, num_cells)
    cluster_off = xyz - scatter.gather_grid(mean_xyz, cell_id)

    h, w = setup.grid_size
    res = jnp.asarray(setup.res_m, points.dtype)
    emin = jnp.asarray(setup.extent_min, points.dtype)
    rc = jnp.stack([cell_id // w, cell_id % w], axis=-1).astype(points.dtype)
    center_xy = (rc + 0.5) * res + emin
    center_off = points[..., :2] - center_xy

    feats = jnp.concatenate([points, cluster_off, center_off], axis=-1)
    return jnp.where(in_pillar[..., None], feats, 0.0)


def scatter_pillars_to_bev(
    point_feats: jnp.ndarray,
    cell_id: jnp.ndarray,
    setup: BevSetup,
) -> jnp.ndarray:
    """Per-point encoded features [N, C] -> dense BEV image [H, W, C] via
    per-pillar max (PillarFeatureNet max pooling + PointPillarsScatter fused).
    Empty pillars are zero."""
    h, w = setup.grid_size
    grid = scatter.scatter_max_grid(point_feats, cell_id, setup.num_cells, fill=0.0)
    return grid.reshape(h, w, point_feats.shape[-1])


def occupancy_map(cell_id: jnp.ndarray, in_pillar: jnp.ndarray, setup: BevSetup):
    """[H, W, 1] pillar occupancy (reference filled_pillar_mask,
    pcl_to_feature_grid.py:52-54 consumed at slim/model/slim.py:65-70)."""
    h, w = setup.grid_size
    ones = in_pillar.astype(jnp.float32)
    occ = scatter.scatter_add_grid(ones, cell_id, setup.num_cells)
    return (occ > 0).astype(jnp.float32).reshape(h, w, 1)
