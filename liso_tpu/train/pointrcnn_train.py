"""PointRCNN training harness (two-stage point pipeline).

Behavioral reference: the PointRCNNWrapper train/eval split of
liso/networks/simple_net/point_rcnn.py:28-276 (experimental in the
reference; same AdamW/OneCycle optimisation as the other detectors).
Mirrors PointPillarsTrainer's interface so the rounds loop
(train/liso_loop._make_trainer) can drive it interchangeably.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from liso_tpu.models.pointrcnn import (
    PointRCNNCfg,
    PointRCNNNet,
    pointrcnn_loss,
)
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes
from liso_tpu.ops.nms import batched_nms
from liso_tpu.utils.schedules import onecycle


class PRTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class PointRCNNTrainer:
    def __init__(
        self,
        bev: BevSetup,
        *,
        cfg: PointRCNNCfg = PointRCNNCfg(),
        max_lr: float = 1e-3,
        total_steps: int = 150_000,
        weight_decay: float = 0.01,
        nms_iou_threshold: float = 0.1,
        post_max_boxes: int = 100,
        confidence_threshold: float = 0.3,
    ):
        self.bev = bev
        self.model = PointRCNNNet(bev, cfg=cfg)
        self.nms_iou_threshold = nms_iou_threshold
        self.post_max_boxes = post_max_boxes
        self.confidence_threshold = confidence_threshold
        self.lr_schedule = onecycle(max_lr, total_steps)
        self.tx = optax.adamw(self.lr_schedule, weight_decay=weight_decay)

    def init_state(self, rng, points, valid) -> PRTrainState:
        variables = self.model.init(rng, points, valid)
        params = variables["params"]
        return PRTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
        )

    def _forward(self, params, batch_stats, points, valid, train):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mut = self.model.apply(
                variables, points, valid, train=True, mutable=["batch_stats"]
            )
            return out, mut["batch_stats"]
        out = self.model.apply(variables, points, valid, train=False)
        return out, batch_stats

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: PRTrainState, points, valid, target: Boxes):
        def loss_fn(params):
            out, new_bs = self._forward(
                params, state.batch_stats, points, valid, True
            )
            total, losses = pointrcnn_loss(out, points, valid, target)
            return total, (new_bs, losses)

        (loss, (new_bs, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {f"loss/{k}": v for k, v in losses.items()}
        metrics["loss/total"] = loss
        metrics["lr"] = self.lr_schedule(state.step)
        return (
            PRTrainState(
                step=state.step + 1, params=params, batch_stats=new_bs,
                opt_state=opt_state,
            ),
            metrics,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def predict_step(self, state: PRTrainState, points, valid) -> Boxes:
        out, _ = self._forward(
            state.params, state.batch_stats, points, valid, False
        )
        boxes: Boxes = out["refined"]
        probs = jax.nn.sigmoid(boxes.probs)
        boxes = boxes.replace(
            probs=probs,
            valid=boxes.valid & (probs[:, :, 0] >= self.confidence_threshold),
        )
        return batched_nms(
            boxes, iou_threshold=self.nms_iou_threshold,
            post_max_boxes=self.post_max_boxes,
        )
