"""Centermap target rendering: boxes -> gaussian heatmap + regression maps.

Behavioral reference: liso/datasets/torch_dataset_commons.py:190-345
(draw_heat_regression_maps) + liso/kabsch/kabsch_mask.py:79-117
(batched_render_gaussian_kabsch_mask). The reference renders targets in numpy
inside DataLoader workers; here rendering is pure jnp and runs *inside the
jitted train step* on device — the host pipeline only ships the (tiny) box
tensors. Per-box anisotropic gaussians with covariance 0.3 * 0.5 * diag(l, w)
rotated by yaw (the CornerNet-style sigma), peak-normalised; regression maps
take the hottest box per cell.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.models.box_decode import BoxPredictionCfg, prediction_grid_centers
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes

OCCUPANCY_THRESH = 0.01


def render_gaussian_heatmaps(
    boxes: Boxes, centers_xy: jnp.ndarray
) -> jnp.ndarray:
    """Per-slot peak-normalised gaussian [B, K, h, w]
    (batched_render_gaussian_kabsch_mask with normalize_gaussian=False, which
    peak-normalises — kabsch_mask.py:113-117). Invalid slots render zero."""
    # covariance in box frame: 0.3 * 0.5 * diag(len, width)
    sx = 0.3 * 0.5 * boxes.dims[..., 0]
    sy = 0.3 * 0.5 * boxes.dims[..., 1]
    c, s = jnp.cos(boxes.rot[..., 0]), jnp.sin(boxes.rot[..., 0])
    # inverse covariance of R diag(sx,sy) R^-1 (reference composes
    # cov = R @ diag @ R^-1, then evaluates the gaussian with cov^-1)
    inv_sx = 1.0 / jnp.maximum(sx, 1e-6)
    inv_sy = 1.0 / jnp.maximum(sy, 1e-6)
    # inv_cov = R diag(1/sx, 1/sy) R^T  (R orthogonal)
    a = c * c * inv_sx + s * s * inv_sy
    b = c * s * (inv_sx - inv_sy)
    d = s * s * inv_sx + c * c * inv_sy
    dx = centers_xy[None, None, ..., 0] - boxes.pos[..., 0, None, None]
    dy = centers_xy[None, None, ..., 1] - boxes.pos[..., 1, None, None]
    quad = (
        a[..., None, None] * dx * dx
        + 2.0 * b[..., None, None] * dx * dy
        + d[..., None, None] * dy * dy
    )
    heat = jnp.exp(-0.5 * quad)
    # per-slot peak normalisation (kabsch_mask.py:113-117: weight /= max)
    peak = jnp.max(heat, axis=(-2, -1), keepdims=True)
    heat = heat / jnp.maximum(peak, 1e-5)
    return heat * boxes.valid[..., None, None]


def render_centermaps(
    boxes: Boxes,
    bev: BevSetup,
    grid_hw: Tuple[int, int],
    cfg: BoxPredictionCfg,
    per_obj_prob_scale: jnp.ndarray = None,
) -> Dict[str, jnp.ndarray]:
    """Target maps for the centerpoint loss, [B, h, w, C] each plus
    center_bool_mask [B, h, w] (cells containing a box center)."""
    centers = jnp.asarray(prediction_grid_centers(bev, grid_hw))
    heat = render_gaussian_heatmaps(boxes, centers)  # [B, K, h, w]
    if per_obj_prob_scale is not None:
        heat = heat * per_obj_prob_scale[..., None]
    occ = (heat > OCCUPANCY_THRESH).astype(jnp.float32)

    # per-attribute values broadcast over each box's occupancy footprint,
    # hottest box wins per cell
    hottest = (heat == jnp.max(heat, axis=1, keepdims=True)).astype(jnp.float32)
    pick = occ * hottest  # [B, K, h, w]

    if cfg.rotation_method == "vector":
        rot_val = jnp.concatenate([jnp.sin(boxes.rot), jnp.cos(boxes.rot)], -1)
    else:
        rot_val = boxes.rot
    if cfg.dimensions_method == "predict_log_size":
        dims_val = jnp.log(jnp.maximum(boxes.dims, 1e-6))
    else:
        dims_val = boxes.dims

    def paint(vals):  # [B, K, C] -> [B, h, w, C]
        return jnp.einsum("bkhw,bkc->bhwc", pick, vals)

    velo = boxes.velo if boxes.velo is not None else jnp.zeros_like(boxes.probs)
    maps = {
        "probs": jnp.max(heat, axis=1)[..., None],
        "pos": paint(boxes.pos),
        "dims": paint(dims_val),
        "rot": paint(rot_val),
        "velo": paint(velo),
    }

    # center mask: cell containing each valid box center
    h, w = grid_hw
    res = jnp.asarray([bev.bev_range_m[0] / h, bev.bev_range_m[1] / w])
    emin = jnp.asarray(bev.extent_min)
    rc = jnp.floor((boxes.pos[..., :2] - emin) / res).astype(jnp.int32)
    in_range = (
        (rc[..., 0] >= 0)
        & (rc[..., 0] < h)
        & (rc[..., 1] >= 0)
        & (rc[..., 1] < w)
        & boxes.valid
    )
    cell = jnp.where(in_range, rc[..., 0] * w + rc[..., 1], h * w)

    def per_sample(cells):
        m = jax.ops.segment_sum(
            jnp.ones_like(cells, jnp.float32), cells, num_segments=h * w + 1
        )[: h * w]
        return (m > 0).reshape(h, w)

    maps["center_bool_mask"] = jax.vmap(per_sample)(cell)
    return maps
