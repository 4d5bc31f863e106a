"""Flow-cluster bootstrap detector — turns scene flow into initial boxes.

Behavioral reference: liso/networks/flow_cluster_detector/
flow_cluster_detector.py:14-384 + liso/utils/bev_flow_utils.py:6-77. This is
round 0 of the LISO self-training loop: non-rigid (dynamic) BEV flow ->
threshold at time_delta * 1 m/s -> cluster -> rectangle from cluster moments
-> z + height from points inside -> size/aspect filters -> yaw aligned to
the Kabsch motion direction.

TPU deltas: DBSCAN is replaced by on-device connected components over the
thresholded dynamicness grid (liso_tpu.ops.clustering); everything runs
jitted with fixed capacity K_max boxes; the per-box Kabsch runs batched via
vmap instead of the KabschDecoder loop.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from liso_tpu.ops import kabsch as kab
from liso_tpu.ops import transforms as tr
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes
from liso_tpu.ops.clustering import cluster_stats, connected_components
from liso_tpu.ops.scatter import scatter_add_grid


class FlowClusterCfg(NamedTuple):
    min_num_pts_per_box: int = 10
    max_box_len_m: float = 7.0
    aspect_ratio_max: float = 4.0
    min_box_area_m2: float = 0.35  # pedestrian footprint
    min_box_volume_m3: float = 0.5  # pedestrian volume
    min_residual_flow_thresh_mps: float = 1.0
    k_max: int = 64
    dilation: int = 2


def bev_dynamicness_and_flow(
    pcl: jnp.ndarray,  # [N, >=3]
    valid: jnp.ndarray,  # [N]
    cell_id: jnp.ndarray,  # [N] flat BEV cell (drop bucket = num_cells)
    point_flow: jnp.ndarray,  # [N, 3]
    odom_ta_tb: jnp.ndarray,  # [4, 4]
    bev: BevSetup,
):
    """bev_flow_utils.get_bev_dynamic_flow_map_from_pcl_flow_and_odom:
    non-rigid flow = flow - rigid ego flow; scatter-mean to BEV."""
    h, w = bev.grid_size
    inv = tr.invert_pose(odom_ta_tb)
    pts = jnp.where(valid[..., None], pcl[..., :3], 0.0)
    rigid = tr.transform_points(inv[None], pts[None])[0] - pts
    nonrigid = jnp.where(valid[..., None], point_flow - rigid, 0.0)
    res_len = jnp.linalg.norm(nonrigid, axis=-1)

    ones = valid.astype(jnp.float32)
    cnt = scatter_add_grid(ones, cell_id, bev.num_cells)
    dyn = scatter_add_grid(jnp.where(valid, res_len, 0.0), cell_id, bev.num_cells)
    flow_sum = scatter_add_grid(nonrigid, cell_id, bev.num_cells)
    denom = jnp.maximum(cnt, 1.0)
    return (
        (dyn / denom).reshape(h, w),
        (flow_sum / denom[:, None]).reshape(h, w, 3),
    )


def fit_z_and_height(pcl_full: jnp.ndarray, valid: jnp.ndarray, boxes: Boxes,
                     probe_height: float = 1000.0):
    """flow_cluster_detector.fit_bev_box_z_and_height_using_points_in_box:
    count points in the (height-unbounded) box footprint, box z = lowest
    point + half the clipped [1, 2] m height."""
    probe = boxes.replace(
        dims=jnp.concatenate(
            [boxes.dims[..., :2], jnp.full_like(boxes.dims[..., :1], probe_height)],
            -1,
        )
    )
    inside = probe.points_in_box_mask(pcl_full[..., :3])  # [N, K]
    inside = inside & valid[..., None]
    box_T_sensor = tr.invert_pose(boxes.poses())
    z_in_box = (
        jnp.einsum("kj,nj->nk", box_T_sensor[..., 2, :3], pcl_full[..., :3])
        + box_T_sensor[..., 2, 3][None]
    )
    z_max = jnp.max(jnp.where(inside, z_in_box, -probe_height), axis=0)
    z_min = jnp.min(jnp.where(inside, z_in_box, probe_height), axis=0)
    height = jnp.clip(z_max - z_min, 1.0, 2.0)
    min_idx = jnp.argmin(jnp.where(inside, z_in_box, probe_height), axis=0)
    z_sensor_of_lowest = pcl_full[min_idx, 2]
    box_z = z_sensor_of_lowest + 0.5 * height
    return inside.sum(0), box_z, height


@partial(jax.jit, static_argnames=("bev", "cfg"))
def detect_boxes_from_flow(
    pcl: jnp.ndarray,  # [N, >=3] BEV-cropped, no-ground cloud
    valid: jnp.ndarray,  # [N]
    cell_id: jnp.ndarray,  # [N]
    point_flow: jnp.ndarray,  # [N, 3] flow ta->tb
    odom_ta_tb: jnp.ndarray,  # [4, 4]
    pcl_full: jnp.ndarray,  # [M, >=3] full cloud w/ ground (z fitting)
    pcl_full_valid: jnp.ndarray,  # [M]
    time_delta_s: jnp.ndarray,  # scalar
    bev: BevSetup,
    cfg: FlowClusterCfg = FlowClusterCfg(),
) -> Boxes:
    """Single-frame bootstrap detection; returns Boxes of capacity k_max."""
    h, w = bev.grid_size
    dyn, nonrigid = bev_dynamicness_and_flow(
        pcl, valid, cell_id, point_flow, odom_ta_tb, bev
    )
    mask = dyn > time_delta_s * cfg.min_residual_flow_thresh_mps
    labels = connected_components(mask, dilation=cfg.dilation)
    stats = cluster_stats(labels, k_max=cfg.k_max)

    res = jnp.asarray(bev.res_m, jnp.float32)
    emin = jnp.asarray(bev.extent_min, jnp.float32)
    center_xy = (stats.centroid_rc + 0.5) * res + emin
    dims2 = jnp.stack([stats.axis_major, stats.axis_minor], -1) * res[None, :].mean()
    boxes = Boxes(
        pos=jnp.concatenate([center_xy, jnp.zeros_like(center_xy[..., :1])], -1),
        dims=jnp.concatenate([dims2, jnp.ones_like(dims2[..., :1])], -1),
        rot=stats.orientation[..., None],
        probs=jnp.ones_like(stats.orientation[..., None]),
        valid=stats.valid,
    ).with_defaults()

    n_pts, box_z, height = fit_z_and_height(pcl_full, pcl_full_valid, boxes)
    boxes = boxes.replace(
        pos=jnp.concatenate([boxes.pos[..., :2], box_z[..., None]], -1),
        dims=jnp.concatenate([boxes.dims[..., :2], height[..., None]], -1),
    )

    aspect = boxes.dims[..., 0] / jnp.maximum(boxes.dims[..., 1], 1e-3)
    keep = (
        boxes.valid
        & (n_pts >= cfg.min_num_pts_per_box)
        & (aspect <= cfg.aspect_ratio_max)
        & (boxes.dims[..., 0] <= cfg.max_box_len_m)
        & (jnp.prod(boxes.dims[..., :2], -1) > cfg.min_box_area_m2)
        & (jnp.prod(boxes.dims, -1) > cfg.min_box_volume_m3)
    )
    boxes = boxes.replace(valid=keep)

    # yaw aligned with Kabsch motion direction + velocity
    # (flow_cluster_detector.py:310-336)
    member = boxes.points_in_box_mask(pcl[..., :3]) & valid[..., None]  # [N, K]
    wts = member.astype(jnp.float32).T  # [K, N]
    fg_trafos, _ = kab.kabsch_from_flow(
        pcl[None, :, :3], point_flow[None], wts
    )  # [K, 4, 4]
    bg_w = (valid & ~member.any(-1)).astype(jnp.float32)
    bg_trafo, _ = kab.kabsch_from_flow(pcl[:, :3], point_flow, bg_w)

    # motion of box center relative to background, in box coordinates
    centers_h = jnp.concatenate(
        [boxes.pos, jnp.ones_like(boxes.pos[..., :1])], -1
    )
    moved = jnp.einsum("kij,kj->ki", fg_trafos[:, :3, :], centers_h)
    bg_moved = jnp.einsum("ij,kj->ki", bg_trafo[:3, :], centers_h)
    translation = moved - bg_moved  # [K, 3] sensor frame
    # rotate into box frame
    c, s = jnp.cos(boxes.rot[..., 0]), jnp.sin(boxes.rot[..., 0])
    tx = c * translation[..., 0] + s * translation[..., 1]
    ty = -s * translation[..., 0] + c * translation[..., 1]
    delta_angle = jnp.arctan2(ty, tx)
    speed = jnp.linalg.norm(translation[..., :2], axis=-1)
    boxes = boxes.replace(
        rot=boxes.rot + delta_angle[..., None],
        velo=speed[..., None],
    )
    return boxes.mask_invalid()
