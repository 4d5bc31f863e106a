"""Detector training harness (CenterPoint-style + centermap loss).

Behavioral reference: the training-step portion of
liso/kabsch/liso_cli.py:366-660 (forward, centermap loss, AdamW + OneCycle)
— but the centermap targets are rendered *inside* the jitted step from the
target boxes (liso_tpu.data.centermaps) instead of in DataLoader workers, so
the host pipeline only ships points + box tensors. Data-parallel over the
mesh batch axis like the SLIM trainer.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from liso_tpu.data.centermaps import render_centermaps
from liso_tpu.losses.centerpoint_loss import centerpoint_loss, focal_heatmap_loss
from liso_tpu.models.box_decode import BoxPredictionCfg
from liso_tpu.models.box_learner import BoxLearner
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes
from liso_tpu.ops.nms import batched_nms
from liso_tpu.utils.schedules import onecycle


class DetectorTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class DetectorTrainer:
    def __init__(
        self,
        bev: BevSetup,
        *,
        network: str = "centerpoint",
        box_cfg: Optional[BoxPredictionCfg] = None,
        max_lr: float = 1e-4,
        total_steps: int = 150_000,
        weight_decay: float = 0.01,
        nms_iou_threshold: float = 0.1,
        pre_max_boxes: int = 1000,
        post_max_boxes: int = 100,
        confidence_threshold: float = 0.3,
        use_baseline_parameters: bool = True,
        num_decoder_layers: int = 1,
    ):
        self.bev = bev
        self.box_cfg = box_cfg or BoxPredictionCfg()
        self.model = BoxLearner(
            bev,
            box_cfg=self.box_cfg,
            network=network,
            use_baseline_parameters=use_baseline_parameters,
            num_decoder_layers=num_decoder_layers,
        )
        self.network = network
        self.nms_iou_threshold = nms_iou_threshold
        self.pre_max_boxes = pre_max_boxes
        self.post_max_boxes = post_max_boxes
        self.confidence_threshold = confidence_threshold
        # AdamW + OneCycle sized to the round length (liso_cli.py:792-823)
        self.lr_schedule = onecycle(max_lr, total_steps)
        self.tx = optax.adamw(self.lr_schedule, weight_decay=weight_decay)

    # ------------------------------------------------------------------
    def init_state(self, rng, points, valid) -> DetectorTrainState:
        variables = self.model.init(rng, points, valid)
        params = variables["params"]
        return DetectorTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
        )

    # ------------------------------------------------------------------
    def _loss(self, params, batch_stats, points, valid, target_boxes: Boxes,
              ignore_mask, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (flat, decoded, activated, aux), mut = self.model.apply(
                variables, points, valid, train=True, mutable=["batch_stats"]
            )
            new_bs = mut["batch_stats"]
        else:
            flat, decoded, activated, aux = self.model.apply(
                variables, points, valid, train=False
            )
            new_bs = batch_stats
        if self.network == "transfusion":
            # heatmap focal + PER-LAYER hungarian set loss x0.25: the
            # reference assigns targets for every decoder layer separately
            # (auxiliary=True, transfusion_head.py:1248-1284) — each
            # layer's predictions get their own matching + loss
            from liso_tpu.losses.hungarian_loss import hungarian_matching_loss
            from liso_tpu.models.box_decode import (
                apply_activations,
                decode_box_maps,
                flatten_to_boxes,
            )

            heatmap = aux["heatmap"]
            grid_hw = heatmap.shape[1:3]
            gt_maps = render_centermaps(
                target_boxes, self.bev, grid_hw, self.box_cfg
            )
            losses = {
                "heatmap": focal_heatmap_loss(
                    heatmap, gt_maps["probs"], gt_maps["center_bool_mask"],
                    ignore_mask,
                )
            }
            layer_maps = aux.get("layer_maps", None) or (None,)
            n_layers = len(layer_maps)
            for li, lm in enumerate(layer_maps):
                if lm is None:
                    layer_flat = flat
                else:
                    layer_flat = flatten_to_boxes(
                        decode_box_maps(
                            apply_activations(lm, self.box_cfg),
                            self.box_cfg, self.bev,
                        )
                    )
                hung = hungarian_matching_loss(target_boxes, layer_flat)
                suffix = "" if li == n_layers - 1 else f"_aux{li}"
                for k, v in hung.items():
                    losses[f"hungarian_{k}{suffix}"] = 0.25 * v
            losses["total"] = sum(losses.values())
            return losses["total"], (new_bs, losses, flat)
        grid_hw = decoded["probs"].shape[1:3]
        gt_maps = render_centermaps(target_boxes, self.bev, grid_hw, self.box_cfg)
        losses = centerpoint_loss(
            decoded_pred_maps=decoded,
            raw_activated_maps=activated,
            gt_maps=gt_maps,
            center_mask=gt_maps["center_bool_mask"],
            ignore_mask=ignore_mask,
            rotation_method=self.box_cfg.rotation_method,
        )
        return losses["total"], (new_bs, losses, flat)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self,
        state: DetectorTrainState,
        points: jnp.ndarray,
        valid: jnp.ndarray,
        target_boxes: Boxes,
        ignore_mask: Optional[jnp.ndarray] = None,
    ):
        def loss_fn(params):
            return self._loss(
                params, state.batch_stats, points, valid, target_boxes,
                ignore_mask, True,
            )

        (loss, (new_bs, losses, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {f"loss/{k}": v for k, v in losses.items()}
        metrics["lr"] = self.lr_schedule(state.step)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            DetectorTrainState(
                step=state.step + 1,
                params=params,
                batch_stats=new_bs,
                opt_state=opt_state,
            ),
            metrics,
        )

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def predict_step(
        self, state: DetectorTrainState, points: jnp.ndarray, valid: jnp.ndarray
    ) -> Boxes:
        """Eval forward: decode all anchor cells, sigmoid the probs
        (eval path applies sigmoid before NMS, eval_ours.py:360-369),
        confidence-threshold and rotated-NMS down to post_max_boxes."""
        flat, _, _, _ = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
            valid,
            train=False,
        )
        probs = jax.nn.sigmoid(flat.probs)
        flat = flat.replace(
            probs=probs,
            valid=flat.valid & (probs[..., 0] >= self.confidence_threshold),
        )
        # pre-NMS cap (max_num_boxes_before_nms=1000, liso_config.yml:27):
        # bounds the [K, K] IoU matrix regardless of the anchor-grid size
        k_pre = min(self.pre_max_boxes, flat.k)

        def cap(bx):
            score = jnp.where(bx.valid, bx.probs[:, 0], -jnp.inf)
            _, top = jax.lax.top_k(score, k_pre)
            return jax.tree.map(lambda x: x[top], bx)

        flat = jax.vmap(cap)(flat)
        return batched_nms(
            flat,
            iou_threshold=self.nms_iou_threshold,
            post_max_boxes=self.post_max_boxes,
        )
