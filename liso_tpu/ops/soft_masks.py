"""Soft (differentiable) box-membership masks.

Behavioral reference: liso/kabsch/kabsch_mask.py:26-231
(cauchy / sigmoid softness, render_soft_kabsch_mask_torch /
get_box_pixel_weights): per-box weight = prod over axes of
softness(slope * (half_dim - |coord_in_box|)), evaluated at points or BEV
cell centers. Used by the reference's Kabsch training mode and mask
rendering; fully batched jnp here (vmap-friendly over batch/slots).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from liso_tpu.ops import transforms as tr
from liso_tpu.ops.boxes import Boxes


def cauchy(logits: jnp.ndarray) -> jnp.ndarray:
    """kabsch_mask.py:26-28."""
    return 0.5 + jnp.arctan(logits) / jnp.pi


SOFTNESS = {"cauchy": cauchy, "sigmoid": jax.nn.sigmoid}


def soft_box_membership(
    boxes: Boxes,
    pts: jnp.ndarray,  # [..., N, 3] metric points (or BEV cell centers)
    sigmoid_slope: float = 7.0,
    softness_fun: str = "cauchy",
) -> jnp.ndarray:
    """[..., N, K] soft membership weight per (point, box slot); invalid
    slots give 0 (reference pads with NaN)."""
    fn = SOFTNESS[softness_fun]
    box_T_s = tr.invert_pose(boxes.poses())  # [..., K, 4, 4]
    p_box = (
        jnp.einsum("...kij,...nj->...nki", box_T_s[..., :3, :3], pts[..., :3])
        + box_T_s[..., None, :, :3, 3]
    )  # [..., N, K, 3]
    half = 0.5 * boxes.dims[..., None, :, :]
    logits = sigmoid_slope * (half - jnp.abs(p_box))
    w = fn(logits[..., 0]) * fn(logits[..., 1]) * fn(logits[..., 2])
    return w * boxes.valid[..., None, :]
