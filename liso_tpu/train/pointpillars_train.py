"""PointPillars training harness (anchor-based pipeline).

Behavioral reference: the PointPillarsWrapper train/eval split of
liso/networks/simple_net/pointpillars.py:19-245 (train -> loss dict, eval ->
per-sample boxes) with the same AdamW/OneCycle optimisation as the other
detectors. Assignment + losses are fully on device (vmapped per sample).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from liso_tpu.models.pointpillars import (
    AnchorCfg,
    PointPillarsNet,
    decode_predictions,
    make_anchors,
    pointpillars_loss,
)
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes
from liso_tpu.ops.nms import batched_nms
from liso_tpu.utils.schedules import onecycle


class PPTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class PointPillarsTrainer:
    def __init__(
        self,
        bev: BevSetup,
        *,
        anchor_cfg: AnchorCfg = AnchorCfg(),
        max_lr: float = 1e-3,
        total_steps: int = 150_000,
        weight_decay: float = 0.01,
        nms_iou_threshold: float = 0.1,
        post_max_boxes: int = 100,
        confidence_threshold: float = 0.3,
    ):
        self.bev = bev
        self.anchor_cfg = anchor_cfg
        self.model = PointPillarsNet(bev, anchor_cfg=anchor_cfg)
        self.nms_iou_threshold = nms_iou_threshold
        self.post_max_boxes = post_max_boxes
        self.confidence_threshold = confidence_threshold
        self.lr_schedule = onecycle(max_lr, total_steps)
        self.tx = optax.adamw(self.lr_schedule, weight_decay=weight_decay)
        self._anchors = None

    def anchors_flat(self, grid_hw) -> jnp.ndarray:
        if self._anchors is None or self._anchors.shape[:2] != tuple(grid_hw):
            self._anchors = make_anchors(self.bev, grid_hw, self.anchor_cfg)
        h, w, a, _ = self._anchors.shape
        return jnp.asarray(self._anchors.reshape(h * w * a, 7))

    def init_state(self, rng, points, valid) -> PPTrainState:
        variables = self.model.init(rng, points, valid)
        params = variables["params"]
        return PPTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
        )

    def _forward(self, params, batch_stats, points, valid, train):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (cls, reg, direction, occ), mut = self.model.apply(
                variables, points, valid, train=True, mutable=["batch_stats"]
            )
            return cls, reg, direction, mut["batch_stats"]
        cls, reg, direction, occ = self.model.apply(
            variables, points, valid, train=False
        )
        return cls, reg, direction, batch_stats

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: PPTrainState, points, valid, target: Boxes):
        def loss_fn(params):
            cls, reg, direction, new_bs = self._forward(
                params, state.batch_stats, points, valid, True
            )
            b, h, w, a = cls.shape
            anchors = self.anchors_flat((h, w))

            def per_sample(c, r, d, gt):
                return pointpillars_loss(
                    c.reshape(-1), r.reshape(-1, 7), d.reshape(-1, 2),
                    anchors, gt, self.anchor_cfg,
                )

            losses = jax.vmap(per_sample)(
                cls, reg, direction, target
            )
            losses = {k: v.mean() for k, v in losses.items()}
            total = sum(losses.values())
            return total, (new_bs, losses)

        (loss, (new_bs, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {f"loss/{k}": v for k, v in losses.items()}
        metrics["loss/total"] = loss
        metrics["lr"] = self.lr_schedule(state.step)
        return (
            PPTrainState(
                step=state.step + 1, params=params, batch_stats=new_bs,
                opt_state=opt_state,
            ),
            metrics,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def predict_step(self, state: PPTrainState, points, valid) -> Boxes:
        cls, reg, direction, _ = self._forward(
            state.params, state.batch_stats, points, valid, False
        )
        b, h, w, a = cls.shape
        anchors = self.anchors_flat((h, w))

        def per_sample(c, r, d):
            boxes = decode_predictions(
                c.reshape(-1), r.reshape(-1, 7), d.reshape(-1, 2), anchors
            )
            probs = jax.nn.sigmoid(boxes.probs)
            # keep top pre-NMS candidates to bound the NMS matrix
            k_pre = min(1000, boxes.k)
            _, top = jax.lax.top_k(probs[:, 0], k_pre)
            boxes = jax.tree.map(lambda x: x[top], boxes)
            probs = probs[top]
            return boxes.replace(
                probs=probs,
                valid=boxes.valid & (probs[:, 0] >= self.confidence_threshold),
            )

        flat = jax.vmap(per_sample)(cls, reg, direction)
        return batched_nms(
            flat, iou_threshold=self.nms_iou_threshold,
            post_max_boxes=self.post_max_boxes,
        )
