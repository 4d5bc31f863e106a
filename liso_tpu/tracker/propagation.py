"""Flow-based box propagation + motion-aligned yaw flipping (jit-able).

Behavioral reference: liso/tracker/tracking.py:2168-2211
(propagate_boxes_forward_using_flow) and liso/kabsch/shape_utils.py:583-645
(extract_box_motion_transform_without_sensor_odometry /
soft_align_box_flip_orientation_with_motion_trafo). Works on a single frame's
fixed-capacity Boxes; invalid slots propagate identity.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from liso_tpu.ops import transforms as tr
from liso_tpu.ops.boxes import Boxes


def mean_flow_per_box(
    boxes: Boxes, pcl: jnp.ndarray, valid: jnp.ndarray, flow: jnp.ndarray
) -> jnp.ndarray:
    """[K, 3] average flow of the points inside each box
    (tracking.py:2176-2186)."""
    inside = boxes.points_in_box_mask(pcl[..., :3]) & valid[..., None]  # [N, K]
    w = inside.astype(jnp.float32)
    cnt = jnp.maximum(w.sum(0), 1.0)
    return (w[..., None] * flow[:, None, :]).sum(0) / cnt[:, None]


def propagate_boxes_with_flow(
    boxes: Boxes,
    pcl: jnp.ndarray,
    valid: jnp.ndarray,
    flow: jnp.ndarray,  # pointwise flow ta->tb (sensor-ta coords)
    odom_ta_tb: jnp.ndarray,  # [4, 4]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (fg_trafos [K,4,4] = I + mean-flow translation,
    bg_trafo [4,4] = inv(odom), propagated_poses [K,4,4] =
    fg_trafo @ sensor_T_box — the reference's st1_T_bt1)."""
    mf = mean_flow_per_box(boxes, pcl, valid, flow)
    k = boxes.k
    fg = jnp.tile(jnp.eye(4)[None], (k, 1, 1)).at[:, :3, 3].set(mf)
    bg = tr.invert_pose(odom_ta_tb)
    poses = boxes.poses()
    return fg, bg, fg @ poses


def box_motion_without_odometry(
    boxes: Boxes, fg_trafos: jnp.ndarray, bg_trafo: jnp.ndarray
) -> jnp.ndarray:
    """b0_deltaT_b1 = box_T_s0 @ inv(bg) @ fg @ s0_T_box
    (shape_utils.py:583-607): relative box motion with ego motion removed,
    in box coordinates."""
    s0_T_b = boxes.poses()
    b_T_s0 = tr.invert_pose(s0_T_b)
    s0_T_s1 = tr.invert_pose(bg_trafo)
    return b_T_s0 @ s0_T_s1 @ fg_trafos @ s0_T_b


def soft_align_yaw_with_motion(
    boxes: Boxes,
    fg_trafos: jnp.ndarray,
    bg_trafo: jnp.ndarray,
    no_align_below_m: float = 0.1,
    full_align_above_m: float = 0.3,
) -> Boxes:
    """shape_utils.py:608-645: resolve the 180deg yaw ambiguity by flipping
    boxes whose motion points backwards, then blend yaw towards the motion
    direction proportionally to displacement; velo = displacement."""
    delta = box_motion_without_odometry(boxes, fg_trafos, bg_trafo)
    transl = delta[..., :3, 3]
    disp = jnp.linalg.norm(transl[..., :2], axis=-1)
    needs_flip = (transl[..., 0] < 0.0) & (disp > no_align_below_m)
    t2 = jnp.where(needs_flip[..., None], -transl[..., :2], transl[..., :2])
    rot = jnp.where(needs_flip[..., None], boxes.rot + jnp.pi, boxes.rot)
    ratio = jnp.clip(
        (disp - no_align_below_m) / (full_align_above_m - no_align_below_m),
        0.0,
        1.0,
    )[..., None]
    delta_angle = jnp.arctan2(t2[..., 1:2], t2[..., 0:1])
    rot = rot + ratio * delta_angle
    return boxes.replace(rot=rot, velo=disp[..., None])
