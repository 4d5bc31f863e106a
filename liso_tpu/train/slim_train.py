"""SLIM training harness: functional train state + jitted DP train step.

Behavioral reference: liso/slim/experiment.py:164-919 (prepare / run /
train_one_step). The torch version mutates module buffers and steps a
scheduler object; here the whole step — forward (all RAFT iterations),
per-iteration decode + loss, threshold update, RMSprop update — is a single
jitted function over an explicit state pytree, data-parallel over the mesh
batch axis.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from liso_tpu.data.sample import FlowSample
from liso_tpu.losses.slim_loss import SlimLossCfg, slim_loss_single_iteration
from liso_tpu.models.pillar_encoder import pillar_coords
from liso_tpu.models.slim import (
    MovAvgState,
    SlimModel,
    movavg_init,
    movavg_value,
)
from liso_tpu.models.slim_decoder import DecoderCfg, decode
from liso_tpu.ops.bev import BevSetup, voxel_center_coords
from liso_tpu.utils.schedules import polynomial_decay_with_warmup


class SlimTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    movavg: MovAvgState


class SlimTrainer:
    """Builds model, optimizer and the jitted train/eval steps."""

    def __init__(
        self,
        bev: BevSetup,
        *,
        num_iters: int = 6,
        predict_weight_for_static_aggregation: Any = False,
        use_static_aggr_flow_for_aggr_flow: bool = False,
        loss_cfg: Optional[SlimLossCfg] = None,
        optimizer: str = "rmsprop",
        initial_lr: float = 1e-4,
        warmup_steps: int = 2000,
        train_steps: int = 150_000,
        num_train_samples: int = 1,
        grad_clip_norm: float = 0.0,
    ):
        self.bev = bev
        self.num_iters = num_iters
        self.model = SlimModel(
            bev=bev,
            num_iters=num_iters,
            predict_weight_for_static_aggregation=(
                predict_weight_for_static_aggregation
            ),
        )
        self.dcfg = DecoderCfg(
            predict_weight_for_static_aggregation=(
                predict_weight_for_static_aggregation
            ),
            use_static_aggr_flow_for_aggr_flow=use_static_aggr_flow_for_aggr_flow,
        )
        ext = (
            -0.5 * bev.bev_range_m[0],
            -0.5 * bev.bev_range_m[1],
            0.5 * bev.bev_range_m[0],
            0.5 * bev.bev_range_m[1],
        )
        self.lcfg = (loss_cfg or SlimLossCfg())._replace(
            bev_extent=ext,
            use_static_aggr_flow_for_aggr_flow=use_static_aggr_flow_for_aggr_flow,
        )
        self.voxel_centers = voxel_center_coords(bev)
        self.num_train_samples = num_train_samples

        schedule = polynomial_decay_with_warmup(
            initial_lr, warmup_steps, train_steps
        )
        self.lr_schedule = schedule
        if optimizer == "rmsprop":
            tx = optax.rmsprop(schedule)
        elif optimizer == "adam":
            tx = optax.adam(schedule)
        else:
            raise ValueError(optimizer)
        if grad_clip_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
        self.tx = tx

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, example: FlowSample) -> SlimTrainState:
        variables = self.model.init(
            rng,
            example.pcl_t0.pcl,
            example.pcl_t0.valid,
            example.pcl_t1.pcl,
            example.pcl_t1.valid,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return SlimTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            movavg=movavg_init(self.num_train_samples),
        )

    # ------------------------------------------------------------------
    def _forward_and_loss(self, params, batch_stats, movavg, batch: FlowSample,
                          train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (out_fw, out_bw, occ0, occ1), mut = self.model.apply(
                variables,
                batch.pcl_t0.pcl,
                batch.pcl_t0.valid,
                batch.pcl_t1.pcl,
                batch.pcl_t1.valid,
                train=True,
                mutable=["batch_stats"],
            )
            new_batch_stats = mut["batch_stats"]
        else:
            out_fw, out_bw, occ0, occ1 = self.model.apply(
                variables,
                batch.pcl_t0.pcl,
                batch.pcl_t0.valid,
                batch.pcl_t1.pcl,
                batch.pcl_t1.valid,
                train=False,
            )
            new_batch_stats = batch_stats

        rc0, _ = pillar_coords(batch.pcl_t0.pcl, batch.pcl_t0.valid, self.bev)
        rc1, _ = pillar_coords(batch.pcl_t1.pcl, batch.pcl_t1.valid, self.bev)
        thr = movavg_value(movavg)

        total = jnp.zeros(())
        metrics = {}
        last_pred = None
        for it in range(self.num_iters):
            pred_fw = decode(
                out_fw[it], thr, cfg=self.dcfg,
                pc=batch.pcl_t0.pcl, rowcol=rc0, point_valid=batch.pcl_t0.valid,
                filled_pillar_mask=occ0 > 0.5, inv_odom=batch.odom_t1_t0,
                voxel_center_xy=self.voxel_centers,
                gt_flow_bev=batch.gt_flow_bev_t0_t1,
            )
            pred_bw = decode(
                out_bw[it], thr, cfg=self.dcfg,
                pc=batch.pcl_t1.pcl, rowcol=rc1, point_valid=batch.pcl_t1.valid,
                filled_pillar_mask=occ1 > 0.5, inv_odom=batch.odom_t0_t1,
                voxel_center_xy=self.voxel_centers,
                gt_flow_bev=batch.gt_flow_bev_t1_t0,
            )
            it_loss, movavg, it_metrics = slim_loss_single_iteration(
                pred_fw, pred_bw,
                batch.pcl_t0.pcl, batch.pcl_t0.valid,
                batch.pcl_t1.pcl, batch.pcl_t1.valid,
                movavg, self.lcfg, update_threshold=train,
            )
            total = total + it_loss
            last_pred = (pred_fw, pred_bw)
            if it == self.num_iters - 1:
                metrics = it_metrics
        return total, (new_batch_stats, movavg, metrics, last_pred)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: SlimTrainState, batch: FlowSample):
        def loss_fn(params):
            return self._forward_and_loss(
                params, state.batch_stats, state.movavg, batch, train=True
            )

        (loss, (batch_stats, movavg, metrics, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["lr"] = self.lr_schedule(state.step)
        new_state = SlimTrainState(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            movavg=movavg,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def predict_step(self, state: SlimTrainState, batch: FlowSample):
        """Final-iteration predictions for eval / flow export."""
        _, (_, _, _, last_pred) = self._forward_and_loss(
            state.params, state.batch_stats, state.movavg, batch, train=False
        )
        return last_pred
