"""Fixed-shape sample pytrees — the device-side data model.

The reference moves nested dicts of ragged tensors to GPU via
RecursiveDeviceMover (liso/kabsch/mask_dataset.py:56-118) and masks with
`pcl_is_valid`. Here every sample is a NamedTuple of fixed-capacity arrays
(pad to N_MAX points / K_MAX boxes) so the whole training step jits; the
validity masks carry the same semantics as the reference's.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from liso_tpu.ops.boxes import Boxes


class PointCloud(NamedTuple):
    """reference sample_data["pcl_ta"] (torch_dataset_commons.py:1061-1106)."""

    pcl: jnp.ndarray  # [B, N, 4] x, y, z, intensity
    valid: jnp.ndarray  # [B, N] bool


class FlowSample(NamedTuple):
    """One (t0, t1) frame pair for SLIM training.

    odom_t0_t1 = t0_T_t1 (pose of sensor at t1 expressed in t0) — same
    convention as the reference's sample `odom_ta_tb`."""

    pcl_t0: PointCloud
    pcl_t1: PointCloud
    odom_t0_t1: jnp.ndarray  # [B, 4, 4]
    odom_t1_t0: jnp.ndarray  # [B, 4, 4]
    gt_flow_bev_t0_t1: Optional[jnp.ndarray] = None  # [B, H, W, 2]
    gt_flow_bev_t1_t0: Optional[jnp.ndarray] = None


class DetectionSample(NamedTuple):
    """One frame for detector training (reference 4-tuple element
    sample_data_t0 of lidar_dataset_collate_fn)."""

    pcl: PointCloud
    boxes: Boxes  # mined or GT target boxes
    centermaps: Optional[jnp.ndarray] = None  # [B, H, W, C] rendered targets
    centermaps_ignore: Optional[jnp.ndarray] = None  # [B, H, W] bool


def pad_points(pts: np.ndarray, n_max: int) -> "tuple[np.ndarray, np.ndarray]":
    """Host-side: pad/trim [N, F] -> ([n_max, F], valid [n_max])."""
    n = min(len(pts), n_max)
    out = np.zeros((n_max, pts.shape[-1]), np.float32)
    out[:n] = pts[:n]
    valid = np.zeros((n_max,), bool)
    valid[:n] = True
    return out, valid
