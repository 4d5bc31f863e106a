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
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from liso_tpu.data.sample import FlowSample, PointCloud
from liso_tpu.losses.slim_loss import (
    SlimLossCfg,
    batched_knn_for_iterations,
    slim_loss_single_iteration,
    threshold_update_inputs,
)
from liso_tpu.models.pillar_encoder import pillar_coords
from liso_tpu.models.slim import (
    MovAvgState,
    SlimModel,
    movavg_init,
    movavg_update_batched,
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
        compute_dtype: Any = None,
    ):
        self.bev = bev
        self.num_iters = num_iters
        # compute_dtype=jnp.bfloat16 runs conv/matmul compute in bf16
        # (params + optimizer state + loss stay f32; flax norms accumulate
        # mean/var in f32 internally) — on TPU this halves activation HBM
        # traffic and feeds the MXU its native input width. Default None =
        # f32 everywhere, the reference's torch fp32 training semantics.
        self.model = SlimModel(
            bev=bev,
            num_iters=num_iters,
            predict_weight_for_static_aggregation=(
                predict_weight_for_static_aggregation
            ),
            compute_dtype=compute_dtype,
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
    def _sort_batch(self, batch: FlowSample):
        """Sort both clouds by BEV cell id (x-major row order). Invariant
        for the loss (all reductions are masked means); required by the
        TPU kNN kernel's x-band pruning and lets every grid<->point gather
        use the sorted-cell Pallas ops. Returns (batch, (perm0, perm1))
        with perms to recover the original point order."""
        from liso_tpu.ops.bev import point_cell_ids

        def sort_cloud(pc: PointCloud):
            f = pc.pcl.shape[-1]
            cell, _, _ = point_cell_ids(
                pc.pcl[..., :2], self.bev, pc.valid
            )
            n = pc.pcl.shape[1]
            arange = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.float32)[None], cell.shape
            )
            ops = jax.lax.sort(
                [cell]
                + [pc.pcl[..., i] for i in range(f)]
                + [pc.valid.astype(jnp.float32), arange],
                dimension=-1,
                num_keys=1,
            )
            pcl = jnp.stack(ops[1 : 1 + f], axis=-1)
            valid = ops[1 + f] > 0.5
            perm = ops[2 + f].astype(jnp.int32)
            return PointCloud(pcl=pcl, valid=valid), perm

        pc0, perm0 = sort_cloud(batch.pcl_t0)
        pc1, perm1 = sort_cloud(batch.pcl_t1)
        return batch._replace(pcl_t0=pc0, pcl_t1=pc1), (perm0, perm1)

    def _forward_and_loss(self, params, batch_stats, movavg, batch: FlowSample,
                          train: bool, need_loss: bool = True):
        batch, _ = self._sort_batch(batch)
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

        rc0, inr0 = pillar_coords(batch.pcl_t0.pcl, batch.pcl_t0.valid, self.bev)
        rc1, inr1 = pillar_coords(batch.pcl_t1.pcl, batch.pcl_t1.valid, self.bev)
        h, w = self.bev.grid_size
        imax = jnp.iinfo(jnp.int32).max
        cells0 = jnp.where(
            inr0 & batch.pcl_t0.valid, rc0[..., 0] * w + rc0[..., 1], imax
        ).astype(jnp.int32)
        cells1 = jnp.where(
            inr1 & batch.pcl_t1.valid, rc1[..., 0] * w + rc1[..., 1], imax
        ).astype(jnp.int32)
        thr = movavg_value(movavg)

        # decode every iteration first, then run ONE batched 1-NN dispatch
        # per direction covering all iterations x flow types (vs one per
        # iteration x type x direction) — exact: `thr` is read once per
        # step, so iterations don't feed back into each other
        preds_fw, preds_bw = [], []
        iters = range(self.num_iters) if need_loss else [self.num_iters - 1]
        for it in iters:
            preds_fw.append(decode(
                out_fw[it], thr, cfg=self.dcfg,
                pc=batch.pcl_t0.pcl, rowcol=rc0, point_cells=cells0,
                point_valid=batch.pcl_t0.valid,
                filled_pillar_mask=occ0 > 0.5, inv_odom=batch.odom_t1_t0,
                voxel_center_xy=self.voxel_centers,
                gt_flow_bev=batch.gt_flow_bev_t0_t1,
            ))
            preds_bw.append(decode(
                out_bw[it], thr, cfg=self.dcfg,
                pc=batch.pcl_t1.pcl, rowcol=rc1, point_cells=cells1,
                point_valid=batch.pcl_t1.valid,
                filled_pillar_mask=occ1 > 0.5, inv_odom=batch.odom_t0_t1,
                voxel_center_xy=self.voxel_centers,
                gt_flow_bev=batch.gt_flow_bev_t1_t0,
            ))
        if not need_loss:
            # flow export / box prediction: only the final iteration's
            # decoded prediction is consumed — skip kNN + loss entirely
            last_pred = (preds_fw[-1], preds_bw[-1])
            return jnp.zeros(()), (new_batch_stats, movavg, {}, last_pred)

        knn_fw_all = batched_knn_for_iterations(
            preds_fw, batch.pcl_t0.pcl, batch.pcl_t0.valid,
            batch.pcl_t1.pcl, batch.pcl_t1.valid, self.lcfg,
        )
        knn_bw_all = batched_knn_for_iterations(
            preds_bw, batch.pcl_t1.pcl, batch.pcl_t1.valid,
            batch.pcl_t0.pcl, batch.pcl_t0.valid, self.lcfg,
        )

        total = jnp.zeros(())
        metrics = {}
        upd_inputs = []
        do_thresh = train and self.lcfg.use_static_aggr_flow_for_aggr_flow
        for it in range(self.num_iters):
            it_loss, movavg, it_metrics = slim_loss_single_iteration(
                preds_fw[it], preds_bw[it],
                batch.pcl_t0.pcl, batch.pcl_t0.valid,
                batch.pcl_t1.pcl, batch.pcl_t1.valid,
                movavg, self.lcfg, update_threshold=False,
                knn_fw=knn_fw_all[it], knn_bw=knn_bw_all[it],
            )
            if do_thresh:
                upd_inputs.append(threshold_update_inputs(
                    preds_fw[it], preds_bw[it], knn_fw_all[it],
                    knn_bw_all[it], batch.pcl_t0.valid, batch.pcl_t1.valid,
                ))
            total = total + it_loss
            if it == self.num_iters - 1:
                metrics = it_metrics
        if upd_inputs:
            # all iterations' threshold histograms in ONE sort+scatter pass
            # (sequential EMA fold preserved exactly)
            movavg = movavg_update_batched(
                movavg, *(jnp.stack(a) for a in zip(*upd_inputs))
            )
        last_pred = (preds_fw[-1], preds_bw[-1])
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
        """Final-iteration predictions for eval / flow export, with
        per-point outputs restored to the caller's point order (the
        forward pass runs on cell-sorted points)."""
        _, (_, _, _, last_pred) = self._forward_and_loss(
            state.params, state.batch_stats, state.movavg, batch,
            train=False, need_loss=False,
        )
        _, (perm0, perm1) = self._sort_batch(batch)
        n0 = batch.pcl_t0.pcl.shape[1]
        n1 = batch.pcl_t1.pcl.shape[1]

        def unsort(pred, perm, n):
            inv = jnp.argsort(perm, axis=-1)

            def fix(x):
                if (
                    isinstance(x, jnp.ndarray)
                    and x.ndim >= 2
                    and x.shape[:2] == perm.shape
                ):
                    return jnp.take_along_axis(
                        x,
                        inv.reshape(inv.shape + (1,) * (x.ndim - 2)),
                        axis=1,
                    )
                return x
            return jax.tree_util.tree_map(fix, pred)

        pred_fw, pred_bw = last_pred
        return unsort(pred_fw, perm0, n0), unsort(pred_bw, perm1, n1)
