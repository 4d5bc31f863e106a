"""PointRCNN-style two-stage point detector, TPU-native.

Behavioral reference: liso/networks/simple_net/point_rcnn.py:28-276 (wraps
mmdet3d's PointRCNN: PointNet++ backbone -> per-point foreground
segmentation + proposal regression -> canonical ROI refinement; marked
experimental in the reference). TPU-first redesign:

  * stage 1 keeps the per-point prediction structure and consumes
    point-LOCAL geometry like the reference's PointNet++: two
    set-abstraction groupings over a grid-hashed fixed-K ball query
    (ops/ball_query.py — sorted cell hash, static shapes, k nearest
    in-radius neighbors -> shared MLP -> masked max), concatenated with
    features gathered from the dense BEV backbone (which supplies the
    global context the reference gets from its SA/FP hierarchy);
  * top-K proposals by foreground score (replaces NMS-based proposal
    filtering at this stage);
  * stage 2 is the canonical refinement: points inside each (bloated)
    proposal are pooled in box coordinates through a small shared
    PointNet (MLP + masked max), predicting box deltas + confidence.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from liso_tpu.models.centerpoint import RPN, ConvBNRelu
from liso_tpu.models.pillar_encoder import PillarEncoder
from liso_tpu.ops.ball_query import grid_ball_query
from liso_tpu.ops.bev import BevSetup, point_cell_ids
from liso_tpu.ops.boxes import Boxes


class SetAbstraction(nn.Module):
    """One PointNet++-style grouping layer: fixed-K ball query around every
    point, relative-coordinate + feature MLP, masked max-pool. Mirrors the
    reference backbone's SA semantics (mmdet3d PointNetSAMSG consumed via
    point_rcnn.py:28) with static shapes."""

    bev: BevSetup
    radius: float
    k: int = 16
    out_dim: int = 64

    @nn.compact
    def __call__(self, points, valid, feats=None):
        def query(p, v):
            return grid_ball_query(
                p[:, :3], v, radius=self.radius, k=self.k,
                bev_range_m=tuple(float(r) for r in self.bev.bev_range_m),
            )

        idx, mask = jax.vmap(query)(points, valid)  # [B, N, K]

        def gather(arr, i):
            return arr[i]

        nb_xyz = jax.vmap(gather)(points[..., :3], idx)  # [B, N, K, 3]
        rel = nb_xyz - points[..., None, :3]
        parts = [rel, jax.vmap(gather)(points[..., 3:4], idx)]
        if feats is not None:
            parts.append(jax.vmap(gather)(feats, idx))
        h = jnp.concatenate(parts, axis=-1)
        h = nn.relu(nn.Dense(self.out_dim, name="mlp1")(h))
        h = nn.relu(nn.Dense(self.out_dim, name="mlp2")(h))
        h = jnp.where(mask[..., None], h, -jnp.inf)
        pooled = jnp.max(h, axis=2)
        return jnp.where(jnp.isfinite(pooled), pooled, 0.0)


class PointRCNNCfg(NamedTuple):
    num_proposals: int = 128
    roi_points: int = 64  # points pooled per proposal
    fg_dist_thresh: float = 1.0  # stage-1 fg label: point in a GT box
    refine_bloat: float = 1.2


class PointRCNNNet(nn.Module):
    bev: BevSetup
    cfg: PointRCNNCfg = PointRCNNCfg()
    hid_dim: int = 64

    @nn.compact
    def __call__(self, points, valid, train: bool = False):
        b, n, _ = points.shape
        img, occ = PillarEncoder(
            self.bev, num_channels=self.hid_dim, name="pfn"
        )(points, valid, train=train)
        feat = RPN(
            layer_nums=(3, 5),
            ds_strides=(1, 2),
            ds_filters=(self.hid_dim, 128),
            us_strides=(1, 2),
            us_filters=(64, 64),
            name="backbone",
        )(img, train)  # full-res-ish BEV features
        feat = ConvBNRelu(64, 1, name="reduce")(feat, train)
        fh, fw = feat.shape[1:3]

        # gather BEV features at point locations
        scale_bev = BevSetup(self.bev.bev_range_m, (fh, fw))

        def gather(f, p, v):
            cell, in_r, _ = point_cell_ids(p[:, :2], scale_bev, v)
            flat = f.reshape(fh * fw, -1)
            g = flat[jnp.clip(cell, 0, fh * fw - 1)]
            return jnp.where(in_r[:, None], g, 0.0)

        pf = jax.vmap(gather)(feat, points, valid)  # [B, N, 64]
        local = nn.Dense(32, name="pt_mlp1")(points[..., :4])
        local = nn.relu(local)
        # PointNet++-style local geometry (two scales, like the reference's
        # multi-scale grouping): k-nearest in-radius neighbors -> MLP -> max
        sa1 = SetAbstraction(
            self.bev, radius=1.0, k=16, out_dim=64, name="sa1"
        )(points, valid)
        sa2 = SetAbstraction(
            self.bev, radius=2.5, k=16, out_dim=64, name="sa2"
        )(points, valid, feats=sa1)
        x = jnp.concatenate([pf, local, sa1, sa2], axis=-1)
        x = nn.relu(nn.Dense(128, name="pt_mlp2")(x))

        fg_logit = nn.Dense(1, name="fg_head")(x)[..., 0]  # [B, N]
        # per-point proposal: xy offset, z, dims(log), yaw(sin,cos)
        prop = nn.Dense(8, name="prop_head")(x)  # [B, N, 8]

        # --- stage 2: top-K proposals, canonical refinement
        score = jnp.where(valid, fg_logit, -jnp.inf)
        _, top = jax.lax.top_k(score, self.cfg.num_proposals)  # [B, K]

        def take(v, idx):
            return jnp.take_along_axis(v, idx[..., None], axis=1)

        sel_pts = take(points[..., :3], top)  # [B, K, 3]
        sel_prop = take(prop, top)
        pos = jnp.concatenate(
            [
                sel_pts[..., :2] + jnp.tanh(sel_prop[..., :2]) * 3.0,
                sel_prop[..., 2:3] + sel_pts[..., 2:3],
            ],
            axis=-1,
        )
        dims = jnp.exp(jnp.clip(sel_prop[..., 3:6], -2, 2)) * jnp.asarray(
            [3.9, 1.6, 1.56]
        )
        yaw = jnp.arctan2(sel_prop[..., 6:7], sel_prop[..., 7:8])
        proposals = Boxes(
            pos=pos, dims=dims, rot=yaw,
            probs=take(fg_logit[..., None], top),
            valid=jnp.take_along_axis(valid, top, axis=1),
        ).with_defaults()

        refined = self._refine(
            points, valid, x, jax.nn.sigmoid(fg_logit), proposals, train
        )
        return {
            "fg_logit": fg_logit,
            "proposals": proposals,
            "refined": refined,
            "occupancy": occ,
        }

    @nn.compact_name_scope
    def _refine(self, points, valid, point_feats, fg_prob,
                proposals: Boxes, train):
        """Canonical ROI point pooling + per-proposal re-scoring (the
        reference's stage 2, point_rcnn.py:28-276 over mmdet3d PointRCNN
        RoI head): roi_points per (bloated) proposal are pooled in BOX
        coordinates; each pooled point carries its canonical xyz, sensor
        depth, intensity, stage-1 foreground probability and backbone
        features (mmdet3d feeds xyz-canonical + depth + seg score + SA
        features). A shared PointNet encodes the RoI; SEPARATE cls/reg
        branches produce the re-scored confidence (IoU-trained, see
        pointrcnn_loss) and the box deltas."""
        cfg = self.cfg

        def per_sample(pts, v, pf, fgp, boxes: Boxes):
            inside, p_box = boxes.points_in_box_mask(
                pts[:, :3], bloat=cfg.refine_bloat, return_box_coords=True
            )  # inside [N, K], p_box [N, K, 3]
            inside = inside & v[:, None]
            # deterministic top roi_points per box by insideness
            order = jnp.argsort(~inside, axis=0)[: cfg.roi_points]  # [R, K]
            sel_in = jnp.take_along_axis(inside, order, axis=0)  # [R, K]
            sel_box = jnp.take_along_axis(
                p_box, order[..., None], axis=0
            )  # [R, K, 3]
            depth = jnp.linalg.norm(pts[:, :3], axis=-1, keepdims=True)
            extras = jnp.concatenate(
                [depth, pts[:, 3:4], fgp[:, None]], axis=-1
            )  # [N, 3]
            sel_extra = extras[order]  # [R, K, 3]
            sel_f = pf[order]  # [R, K, C]
            feats = jnp.concatenate([sel_box, sel_extra, sel_f], axis=-1)
            feats = jnp.where(sel_in[..., None], feats, 0.0)
            return feats.transpose(1, 0, 2), sel_in.T  # [K, R, C'], [K, R]

        roi_feats, roi_mask = jax.vmap(per_sample)(
            points, valid, point_feats, fg_prob, proposals
        )
        h = nn.relu(nn.Dense(128, name="roi_mlp1")(roi_feats))
        h = nn.relu(nn.Dense(128, name="roi_mlp2")(h))
        h = jnp.where(roi_mask[..., None], h, -jnp.inf)
        pooled = jnp.max(h, axis=2)  # [B, K, 128]
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        # number of pooled points is itself informative (empty RoI -> junk)
        n_in = roi_mask.sum(axis=2, keepdims=True).astype(pooled.dtype)
        pooled = jnp.concatenate(
            [pooled, n_in / float(cfg.roi_points)], axis=-1
        )
        # separate branches (reference RoI head: cls_layers / reg_layers)
        hc = nn.relu(nn.Dense(64, name="cls_fc")(pooled))
        cls_logit = nn.Dense(1, name="cls_head")(hc)
        hr = nn.relu(nn.Dense(64, name="reg_fc")(pooled))
        out = nn.Dense(7, name="reg_head")(hr)
        d_pos = jnp.tanh(out[..., :3]) * 1.0
        d_dims = jnp.exp(jnp.clip(out[..., 3:6], -1, 1))
        d_yaw = jnp.tanh(out[..., 6:7]) * (jnp.pi / 4)
        return proposals.replace(
            pos=proposals.pos + d_pos,
            dims=proposals.dims * d_dims,
            rot=proposals.rot + d_yaw,
            probs=cls_logit,
        )


def pointrcnn_loss(out, points, valid, gt: Boxes) -> Tuple[jnp.ndarray, dict]:
    """Stage-1 fg focal + both stages' hungarian-style box losses."""
    from liso_tpu.losses.hungarian_loss import hungarian_matching_loss

    # fg labels: point inside any valid GT box
    def per_sample(pts, v, g):
        inside = g.points_in_box_mask(pts[:, :3])
        return inside.any(-1) & v

    fg = jax.vmap(per_sample)(points, valid, gt)
    logit = out["fg_logit"]
    p = jax.nn.sigmoid(logit)
    pt = jnp.where(fg, p, 1 - p)
    focal = -0.25 * (1 - pt) ** 2 * jnp.log(jnp.clip(pt, 1e-7, 1))
    seg_loss = jnp.where(valid, focal, 0.0).sum() / jnp.maximum(
        fg.sum(), 1
    )
    losses = {"seg": seg_loss}
    for stage in ("proposals", "refined"):
        h = hungarian_matching_loss(gt, out[stage])
        for k, v in h.items():
            if stage == "refined" and k == "probs":
                # stage-2 confidence trains ONLY from the IoU-based
                # re-scoring below (reference RoI head semantics) — the
                # distance-matched hungarian probs target marks loosely
                # matched junk positive and fights the IoU label
                continue
            losses[f"{stage}_{k}"] = 0.5 * v

    # stage-2 confidence re-scoring (reference RoI head cls target): the
    # refined box's BEV IoU against GT decides the label — pos > 0.55,
    # neg < 0.45, ignore the band between (mmdet3d PointRCNN assigner
    # semantics) — BCE on the stage-2 cls logit
    from liso_tpu.ops.iou import iou_matrix_bev

    ref: Boxes = jax.lax.stop_gradient(out["refined"])

    def per_sample_best_iou(boxes: Boxes, g: Boxes):
        m = iou_matrix_bev(
            boxes.pos, boxes.dims, boxes.rot, g.pos, g.dims, g.rot,
            boxes.valid, g.valid,
        )
        return m.max(axis=1)

    best_iou = jax.vmap(per_sample_best_iou)(ref, gt)  # [B, K]
    pos_m = best_iou > 0.55
    neg_m = best_iou < 0.45
    use = (pos_m | neg_m) & ref.valid
    logit = out["refined"].probs[..., 0]
    z = jnp.clip(logit, -30, 30)
    bce = jnp.maximum(z, 0) - z * pos_m.astype(z.dtype) + jnp.log1p(
        jnp.exp(-jnp.abs(z))
    )
    losses["rescore"] = (bce * use).sum() / jnp.maximum(use.sum(), 1)
    total = sum(losses.values())
    return total, losses
