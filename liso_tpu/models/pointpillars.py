"""PointPillars detector with anchor head, TPU-native.

Behavioral reference: liso/networks/simple_net/pointpillars.py:19-245 which
wraps mmdet3d's MVXFasterRCNN (HardVFE + PointPillarsScatter + SECOND +
SECONDFPN + Anchor3DHead with CUDA ops). Rebuilt TPU-first:

  * voxel encoder / scatter = liso_tpu.models.pillar_encoder (dense
    segment ops, no voxel lists);
  * SECOND + FPN = the multi-scale conv/deconv RPN (same topology:
    [3,5,5] blocks at strides [2,2,2], deconv-concat neck);
  * Anchor3DHead: A anchors per cell (sizes x 2 rotations), 1x1 conv
    cls/reg/dir heads, standard delta encoding
    (dx/dy normalised by anchor diagonal, dz by height, log dims, dyaw);
  * target assignment on device: rotated-IoU matrix vs fixed-capacity GT
    (MaxIoUAssigner semantics: pos >= 0.6, neg < 0.45, ignore between,
    force-match the best anchor per GT);
  * losses: focal cls + smooth-L1 on deltas + direction CE.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from liso_tpu.models.centerpoint import RPN, ConvBNRelu
from liso_tpu.models.pillar_encoder import PillarEncoder
from liso_tpu.ops import iou as iou_ops
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes

# class-agnostic "movable" anchors: car / van / pedestrian / cyclist sized
# (the reference configures 1 class with multiple anchor sizes,
# pointpillars.py:41-90)
ANCHOR_SIZES = (
    (3.9, 1.6, 1.56),
    (5.2, 2.0, 2.0),
    (0.8, 0.6, 1.73),
    (1.76, 0.6, 1.73),
)
ANCHOR_ROTATIONS = (0.0, np.pi / 2)
ANCHOR_Z = -1.0


class AnchorCfg(NamedTuple):
    sizes: Tuple = ANCHOR_SIZES
    rotations: Tuple = ANCHOR_ROTATIONS
    pos_iou: float = 0.6
    neg_iou: float = 0.45

    @property
    def num_anchors(self):
        return len(self.sizes) * len(self.rotations)


def make_anchors(bev: BevSetup, grid_hw, cfg: AnchorCfg) -> np.ndarray:
    """[h, w, A, 7] (x, y, z, l, w, h, yaw)."""
    h, w = grid_hw
    res = (bev.bev_range_m[0] / h, bev.bev_range_m[1] / w)
    ij = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1) + 0.5
    centers = ij * np.array(res) + np.array(bev.extent_min)  # [h, w, 2]
    anchors = []
    for size in cfg.sizes:
        for rot in cfg.rotations:
            a = np.zeros((h, w, 7), np.float32)
            a[..., :2] = centers
            a[..., 2] = ANCHOR_Z
            a[..., 3:6] = size
            a[..., 6] = rot
            anchors.append(a)
    return np.stack(anchors, axis=2)  # [h, w, A, 7]


def encode_deltas(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Standard SECOND box encoding: [N, 7] gt vs anchors -> deltas."""
    diag = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
    return jnp.stack(
        [
            (gt[..., 0] - anchors[..., 0]) / diag,
            (gt[..., 1] - anchors[..., 1]) / diag,
            (gt[..., 2] - anchors[..., 2]) / jnp.maximum(anchors[..., 5], 1e-3),
            jnp.log(jnp.maximum(gt[..., 3] / anchors[..., 3], 1e-3)),
            jnp.log(jnp.maximum(gt[..., 4] / anchors[..., 4], 1e-3)),
            jnp.log(jnp.maximum(gt[..., 5] / anchors[..., 5], 1e-3)),
            gt[..., 6] - anchors[..., 6],
        ],
        axis=-1,
    )


def decode_deltas(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    diag = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
    return jnp.stack(
        [
            deltas[..., 0] * diag + anchors[..., 0],
            deltas[..., 1] * diag + anchors[..., 1],
            deltas[..., 2] * anchors[..., 5] + anchors[..., 2],
            jnp.exp(jnp.clip(deltas[..., 3], -4, 4)) * anchors[..., 3],
            jnp.exp(jnp.clip(deltas[..., 4], -4, 4)) * anchors[..., 4],
            jnp.exp(jnp.clip(deltas[..., 5], -4, 4)) * anchors[..., 5],
            deltas[..., 6] + anchors[..., 6],
        ],
        axis=-1,
    )


class PointPillarsNet(nn.Module):
    bev: BevSetup
    anchor_cfg: AnchorCfg = AnchorCfg()
    hid_dim: int = 64
    dtype: object = None  # bf16 compute when set (params stay fp32)

    @nn.compact
    def __call__(self, points, valid, train: bool = False):
        img, occ = PillarEncoder(
            self.bev, num_channels=self.hid_dim, name="pfn"
        )(points, valid, train=train)
        feat = RPN(dtype=self.dtype, name="second_fpn")(img, train)
        feat = ConvBNRelu(128, 1, dtype=self.dtype, name="reduce")(feat, train)
        a = self.anchor_cfg.num_anchors
        cls = nn.Conv(a, (1, 1), dtype=self.dtype, name="cls_head")(
            feat).astype(jnp.float32)  # [B, h, w, A]
        reg = nn.Conv(a * 7, (1, 1), dtype=self.dtype, name="reg_head")(
            feat).astype(jnp.float32)
        direction = nn.Conv(a * 2, (1, 1), dtype=self.dtype, name="dir_head")(
            feat).astype(jnp.float32)
        b, h, w, _ = cls.shape
        return (
            cls.reshape(b, h, w, a),
            reg.reshape(b, h, w, a, 7),
            direction.reshape(b, h, w, a, 2),
            occ,
        )


def assign_targets(
    gt: Boxes,  # [K] single-sample fixed-capacity
    anchors_flat: jnp.ndarray,  # [N, 7]
    cfg: AnchorCfg,
):
    """MaxIoUAssigner: per-anchor max rotated BEV IoU vs GT.
    Returns (labels [N] {1 pos, 0 neg, -1 ignore}, matched_gt_idx [N])."""
    n = anchors_flat.shape[0]
    iou = iou_ops.iou_matrix_bev(
        anchors_flat[:, :3], anchors_flat[:, 3:6], anchors_flat[:, 6:7],
        gt.pos, gt.dims, gt.rot,
        jnp.ones((n,), bool), gt.valid,
    )  # [N, K]
    best_iou = iou.max(axis=1)
    best_gt = iou.argmax(axis=1)
    labels = jnp.where(
        best_iou >= cfg.pos_iou, 1, jnp.where(best_iou < cfg.neg_iou, 0, -1)
    )
    # force-match: best anchor of every valid GT becomes positive
    best_anchor_per_gt = iou.argmax(axis=0)  # [K]
    force = jnp.zeros((n,), bool).at[best_anchor_per_gt].set(gt.valid)
    labels = jnp.where(force, 1, labels)
    best_gt = jnp.where(force, jnp.argmax(force[:, None] * iou, axis=1), best_gt)
    return labels, best_gt


def pointpillars_loss(
    cls_logits, reg, direction, anchors_flat, gt: Boxes, cfg: AnchorCfg
):
    """Single-sample loss (vmap over batch): focal cls + smooth-L1 deltas +
    direction CE (mmdet3d Anchor3DHead semantics)."""
    n = anchors_flat.shape[0]
    labels, gt_idx = assign_targets(gt, anchors_flat, cfg)
    pos = labels == 1
    num_pos = jnp.maximum(pos.sum(), 1)

    # focal cls (alpha .25, gamma 2 — mmdet3d FocalLoss defaults)
    p = jax.nn.sigmoid(cls_logits)
    target = pos.astype(jnp.float32)
    alpha, gamma = 0.25, 2.0
    pt = jnp.where(pos, p, 1 - p)
    alpha_t = jnp.where(pos, alpha, 1 - alpha)
    ce = -jnp.log(jnp.clip(pt, 1e-7, 1.0))
    focal = alpha_t * (1 - pt) ** gamma * ce
    cls_loss = jnp.where(labels >= 0, focal, 0.0).sum() / num_pos

    # matched gt box params [N, 7]
    g = gt.with_defaults()
    gt7 = jnp.concatenate([g.pos, g.dims, g.rot], axis=-1)  # [K, 7]
    matched = gt7[gt_idx]
    t = encode_deltas(matched, anchors_flat)
    # sin-difference trick for yaw (SECOND): replace dyaw with sin(dyaw)
    t = t.at[..., 6].set(jnp.sin(t[..., 6]))
    r = reg.at[..., 6].set(jnp.sin(reg[..., 6]))
    diff = jnp.abs(r - t)
    huber = jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
    reg_loss = jnp.where(pos[:, None], huber, 0.0).sum() / num_pos

    # direction: front/back bin of the matched gt yaw
    dir_target = (jnp.cos(matched[..., 6]) < 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(direction, axis=-1)
    dir_ce = -jnp.take_along_axis(logp, dir_target[:, None], axis=-1)[:, 0]
    dir_loss = 0.2 * jnp.where(pos, dir_ce, 0.0).sum() / num_pos
    return {"cls": cls_loss, "reg": reg_loss, "dir": dir_loss}


def decode_predictions(
    cls_logits, reg, direction, anchors_flat
) -> Boxes:
    """[h, w, A(.)] single-sample -> flat Boxes over all anchors."""
    n = anchors_flat.shape[0]
    boxes7 = decode_deltas(reg.reshape(n, 7), anchors_flat)
    # direction classifier flips yaw into the right half-circle
    flip = direction.reshape(n, 2).argmax(-1) == 1
    yaw = jnp.where(flip, boxes7[:, 6] + jnp.pi, boxes7[:, 6])
    return Boxes(
        pos=boxes7[:, :3],
        dims=boxes7[:, 3:6],
        rot=yaw[:, None],
        probs=cls_logits.reshape(n, 1),
        valid=jnp.ones((n,), bool),
    ).with_defaults()
