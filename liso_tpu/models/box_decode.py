"""Box decoding: raw network attribute maps -> metric boxes.

Behavioral reference: liso/kabsch/output_modification.py:4-148 and the
activation table in liso/networks/simple_net/simple_net_utils.py:8-14.
Decodes position (global_relative / local_relative_offset / global_absolute),
dimensions (predict_aspect_ratio / predict_abs_size / predict_log_size) and
rotation (direct / vector / class_bins), then flattens the [B, h, w, *] maps
into a fixed-capacity `Boxes` pytree (the reference flattens to [B, h*w]
anchor lists via maybe_flatten_anchors_except_for).
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes

ACTIVATIONS: Dict[str, Callable] = {
    "none": lambda x: x,
    "softplus": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "exp": jnp.exp,
}


class BoxPredictionCfg(NamedTuple):
    """reference cfg.box_prediction (liso_config.yml:195-229); the
    `centerpoint` preset overrides position to local_relative_offset with
    tanh + abs size + rot vector (liso_config.yml:617-631)."""

    position_method: str = "local_relative_offset"
    num_box_pos_dims: int = 3
    box_z_pos_prior_min: float = -1.5
    box_z_pos_prior_max: float = -0.5
    dimensions_method: str = "predict_abs_size"
    box_len_prior_min: float = 2.0
    box_len_prior_max: float = 8.0
    rotation_method: str = "vector"
    norm_vector_len: bool = False
    activations: Dict[str, str] = None  # type: ignore[assignment]

    def act(self, name: str) -> Callable:
        acts = self.activations or {
            "pos": "tanh",
            "dims": "softplus",
            "rot": "none",
            "probs": "none",
        }
        return ACTIVATIONS[acts.get(name, "none")]

    def head_channels(self):
        """(attr, channels) per head (simple_net_utils.py:
        get_num_dims_per_box_attr)."""
        rot = {"direct": 1, "vector": 2, "none": 0, "class_bins": 36}[
            self.rotation_method
        ]
        dims = {
            "predict_aspect_ratio": 2,
            "predict_abs_size": 3,
            "predict_log_size": 3,
        }[self.dimensions_method]
        return (
            ("pos", self.num_box_pos_dims),
            ("dims", dims),
            ("rot", rot),
            ("probs", 1),
        )


def prediction_grid_centers(bev: BevSetup, grid_hw) -> np.ndarray:
    """[h, w, 2] metric centers of the (downsampled) prediction grid."""
    h, w = grid_hw
    res = (bev.bev_range_m[0] / h, bev.bev_range_m[1] / w)
    ij = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1) + 0.5
    return (ij * np.array(res) + np.array(bev.extent_min)).astype(np.float32)


def apply_activations(
    raw_maps: Dict[str, jnp.ndarray], cfg: BoxPredictionCfg
) -> Dict[str, jnp.ndarray]:
    return {k: cfg.act(k)(v) for k, v in raw_maps.items()}


def decode_box_maps(
    activated: Dict[str, jnp.ndarray],
    cfg: BoxPredictionCfg,
    bev: BevSetup,
) -> Dict[str, jnp.ndarray]:
    """output_modification.py:box_pred_convention_to_gt_convention."""
    out = dict(activated)

    # DIMENSIONS
    dims = out["dims"]
    if cfg.dimensions_method == "predict_aspect_ratio":
        scale, aspect_inv = dims[..., 0:1], dims[..., 1:2]
        box_len = cfg.box_len_prior_min + scale * (
            cfg.box_len_prior_max - cfg.box_len_prior_min
        )
        out["dims"] = jnp.concatenate([box_len, box_len * aspect_inv], axis=-1)
    elif cfg.dimensions_method == "predict_log_size":
        out["dims"] = jnp.exp(dims)  # activation 'exp' already applied upstream
    else:
        assert cfg.dimensions_method == "predict_abs_size"

    # ROTATION
    rot = out["rot"]
    if cfg.rotation_method == "vector":
        if cfg.norm_vector_len:
            rot = rot / jnp.maximum(
                jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-6
            )
        sin_yaw, cos_yaw = rot[..., 0:1], rot[..., 1:2]
        out["rot"] = jnp.arctan2(sin_yaw, cos_yaw)
    elif cfg.rotation_method == "class_bins":
        bin_size = 2 * jnp.pi / rot.shape[-1]
        out["rot"] = (
            jnp.argmax(rot, axis=-1, keepdims=True).astype(jnp.float32) * bin_size
        )
    else:
        assert cfg.rotation_method == "direct"

    # POSITION
    pos = out["pos"]
    if cfg.position_method == "global_relative":
        bev_dims = jnp.asarray(
            list(bev.bev_range_m) + [1.0] * (pos.shape[-1] - 2), jnp.float32
        )
        out["pos"] = pos * bev_dims * 0.6
    elif cfg.position_method == "local_relative_offset":
        h, w = pos.shape[1:3]
        centers = jnp.asarray(prediction_grid_centers(bev, (h, w)))
        res = jnp.asarray(
            [bev.bev_range_m[0] / h, bev.bev_range_m[1] / w], jnp.float32
        )
        xy = centers[None] + res * 0.5 * pos[..., :2]
        if cfg.num_box_pos_dims == 3:
            z = cfg.box_z_pos_prior_min + 0.5 * (pos[..., 2:3] + 1.0) * (
                cfg.box_z_pos_prior_max - cfg.box_z_pos_prior_min
            )
            xy = jnp.concatenate([xy, z], axis=-1)
        out["pos"] = xy
    else:
        assert cfg.position_method == "global_absolute"

    return out


def flatten_to_boxes(decoded: Dict[str, jnp.ndarray]) -> Boxes:
    """[B, h, w, C] maps -> Boxes with K = h*w (anchor-per-cell layout)."""
    b, h, w = decoded["pos"].shape[:3]
    flat = {k: v.reshape(b, h * w, v.shape[-1]) for k, v in decoded.items()}
    pos = flat["pos"]
    if pos.shape[-1] == 2:
        pos = jnp.concatenate([pos, jnp.zeros_like(pos[..., :1])], axis=-1)
    dims = flat["dims"]
    if dims.shape[-1] == 2:
        # aspect-ratio decode has no height; use prior midpoint
        dims = jnp.concatenate(
            [dims, 1.7 * jnp.ones_like(dims[..., :1])], axis=-1
        )
    return Boxes(
        pos=pos,
        dims=dims,
        rot=flat["rot"],
        probs=flat["probs"],
        valid=jnp.ones((b, h * w), bool),
    ).with_defaults()
