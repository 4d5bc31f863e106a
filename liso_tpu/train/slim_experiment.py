"""SLIM experiment: training loop, flow eval, and flow export.

Behavioral reference: liso/slim/experiment.py:71-919 (Experiment) and
:225-471 (run_inference_only). The exported npz schema matches the reference
exactly — per sample: bev_raw_flow_{a}_{b} for all 6 ordered pairs of
(t0, t1, t2), bev_dynamicness_{a}_{b}, static_threshold, bev_range_m — so
either framework's detector stage can consume either's flow exports.
Export jobs shard by sample_idx % world_size == worker_id (:331-353).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.data.dataset import LidarDataset
from liso_tpu.data.pipeline import Prefetcher
from liso_tpu.data.sample import FlowSample, PointCloud
from liso_tpu.eval.flow_metrics import FlowMetrics
from liso_tpu.losses.slim_loss import SlimLossCfg
from liso_tpu.models.slim import movavg_value
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.scatter import scatter_mean_grid
from liso_tpu.ops.bev import point_cell_ids
from liso_tpu.train.slim_train import SlimTrainer
from liso_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from liso_tpu.utils.tb import TBFactory


def compute_moving_mask(
    pts: np.ndarray,
    flow_gt: np.ndarray,
    odom_t1_t0: np.ndarray,
    thresh: float,
) -> np.ndarray:
    """Point is moving iff its GT flow deviates from the full rigid ego
    flow R @ p + t - p by more than `thresh` (reference
    liso/eval/eval_ours.py:340-358). The translation term is essential:
    without it any ego motion (~1 m/frame) marks every point moving."""
    rigid_flow = pts @ odom_t1_t0[:3, :3].T + odom_t1_t0[:3, 3] - pts
    return np.linalg.norm(flow_gt - rigid_flow, axis=-1) > thresh


def batch_to_flow_sample(b: dict) -> FlowSample:
    return FlowSample(
        pcl_t0=PointCloud(jnp.asarray(b["pcl_t0"]), jnp.asarray(b["valid_t0"])),
        pcl_t1=PointCloud(jnp.asarray(b["pcl_t1"]), jnp.asarray(b["valid_t1"])),
        odom_t0_t1=jnp.asarray(b["odom_t0_t1"]),
        odom_t1_t0=jnp.asarray(b["odom_t1_t0"]),
    )


def slim_trainer_from_cfg(cfg, bev: BevSetup, num_train_samples: int) -> SlimTrainer:
    sl = cfg.SLIM
    lu = sl.losses.unsupervised
    loss_cfg = SlimLossCfg(
        knn_loss_penalty_factor=float(lu.knn_loss_penalty_factor),
        static_flow_penalty_factor=float(lu.static_flow_penalty_factor),
        fw_bw_static_trafo_penalty_factor=float(
            lu.fw_bw_static_trafo_penalty_factor
        ),
        knn_on_dynamic_penalty=float(lu.knn_on_dynamic_penalty),
        knn_on_static_penalty=float(lu.knn_on_static_penalty),
        artificial_cross_entropy_penalty=float(
            lu.artificial_labels.cross_entropy_penalty
        ),
        artificial_use_static_aggr_flow=bool(
            lu.artificial_labels.use_static_aggr_flow
        ),
        knn=SlimLossCfg().knn._replace(
            L1_delta=float(lu.knn_loss.L1_delta),
            drop_outliers_perc=float(lu.knn_loss.drop_outliers__perc),
            fov_mode=str(lu.knn_loss.fov_mode),
        ),
    )
    pw = sl.model.predict_weight_for_static_aggregation
    return SlimTrainer(
        bev,
        num_iters=int(sl.model.num_iters),
        predict_weight_for_static_aggregation=(
            pw if pw not in (False, "off", None) else False
        ),
        use_static_aggr_flow_for_aggr_flow=bool(
            sl.model.use_static_aggr_flow_for_aggr_flow
        ),
        loss_cfg=loss_cfg,
        optimizer=str(sl.optimizer),
        initial_lr=float(sl.learning_rate.initial),
        warmup_steps=int(sl.learning_rate.warm_up.step_length),
        train_steps=int(sl.iterations.train),
        num_train_samples=num_train_samples,
    )


class SlimExperiment:
    def __init__(self, cfg, bev: BevSetup, train_dataset: LidarDataset,
                 val_dataset: Optional[LidarDataset], log_dir):
        self.cfg = cfg
        self.bev = bev
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.log_dir = Path(log_dir)
        self.tb = TBFactory(self.log_dir / "tb")
        try:
            import yaml

            from liso_tpu.train.liso_loop import _to_plain

            self.tb("train").add_text(
                "config", "```\n" + yaml.safe_dump(_to_plain(cfg)) + "\n```", 0
            )
        except Exception:
            pass
        self.trainer = slim_trainer_from_cfg(cfg, bev, len(train_dataset))
        self.state = None

    def maybe_restore(self, ckpt_path=None):
        ckpt_dir = Path(ckpt_path) if ckpt_path else self.log_dir / "ckpts"
        step = latest_step(ckpt_dir)
        if step is None or self.state is None:
            return
        from liso_tpu.utils.checkpoint import check_checkpoint_config_sanity

        # fail fast on incompatible checkpoints instead of an opaque
        # orbax shape mismatch (reference load_checkpoint_check_sanity)
        check_checkpoint_config_sanity(
            ckpt_dir, self.cfg,
            keys=("data.img_grid_size", "data.bev_range_m"),
        )
        self.state = restore_checkpoint(ckpt_dir, step, self.state)

    # ------------------------------------------------------------------
    def run(self, max_steps: Optional[int] = None):
        sl = self.cfg.SLIM
        total = max_steps or int(sl.iterations.train)
        eval_every = int(sl.iterations.eval_every)
        save_every = int(self.cfg.checkpoint.save_model_every)
        loader = Prefetcher(
            self.train_dataset,
            batch_size=int(sl.batch_size),
            num_workers=int(self.cfg.data.num_workers) or 1,
        )
        step = 0
        it = iter(loader)
        while step < total:
            try:
                batch = next(it)
            except StopIteration:
                it = iter(loader)
                batch = next(it)
            t0 = time.time()
            fs = batch_to_flow_sample(batch)
            if self.state is None:
                self.state = self.trainer.init_state(
                    jax.random.PRNGKey(int(sl.seed)), fs
                )
                self.maybe_restore()
            self.state, metrics = self.trainer.train_step(self.state, fs)
            self.tb.global_step = step
            w = self.tb("train", "metrics/")
            w.add_scalars({k: float(v) for k, v in metrics.items()}, step)
            w.add_scalar("timing/step_s", time.time() - t0, step)
            if eval_every and step > 0 and step % eval_every == 0:
                self.evaluate(step)
            if save_every and step > 0 and step % save_every == 0:
                save_checkpoint(self.log_dir / "ckpts", step, self.state)
            step += 1
        if self.state is not None:
            save_checkpoint(self.log_dir / "ckpts", step, self.state)
        return self.state

    # ------------------------------------------------------------------
    def evaluate(self, step: int, max_batches: int = 10) -> Dict[str, float]:
        if self.val_dataset is None:
            return {}
        fm = FlowMetrics()
        loader = Prefetcher(
            self.val_dataset, batch_size=1, shuffle=False, num_workers=2
        )
        thresh = float(
            self.cfg.validation.obj_is_moving_velocity_thresh
        )
        for i, batch in enumerate(iter(loader)):
            if i >= max_batches:
                break
            fs = batch_to_flow_sample(batch)
            pred_fw, _ = self.trainer.predict_step(self.state, fs)
            flow_pred = np.asarray(pred_fw.aggregated_flow[0])
            flow_gt = np.asarray(batch["flow_t0_t1"][0])
            pts = np.asarray(batch["pcl_t0"][0, :, :3])
            mask = np.asarray(batch["valid_t0"][0])
            is_moving = compute_moving_mask(
                pts, flow_gt, np.asarray(batch["odom_t1_t0"][0]), thresh
            )
            fm.update(pts, flow_pred, flow_gt, is_moving, mask)
            if i < 2:  # image summaries (experiment.py:731-770): flow RGB
                # (pred | gt) side by side + a range image of the cloud
                self._log_eval_images(step, i, pts, mask, flow_pred, flow_gt)
        out = fm.compute()
        self.tb("val", "flow/").add_scalars(out, step)
        return out

    def _log_eval_images(self, step, i, pts, mask, flow_pred, flow_gt):
        from liso_tpu.ops.bev import point_cell_ids
        from liso_tpu.visu.bbox_image import render_pcl_range_image
        from liso_tpu.visu.flow_image import flow_to_rgb

        h, w = self.bev.grid_size
        cell, _, _ = point_cell_ids(
            jnp.asarray(pts[:, :2]), self.bev, jnp.asarray(mask)
        )
        panels = []
        for fl in (flow_pred, flow_gt):
            grid, _ = scatter_mean_grid(
                jnp.asarray(fl[:, :2]), cell, self.bev.num_cells
            )
            panels.append(
                flow_to_rgb(np.asarray(grid).reshape(h, w, 2))
            )
        wtr = self.tb("val", "images/")
        wtr.add_image(
            f"flow_pred_vs_gt/b{i}", np.concatenate(panels, axis=1), step
        )
        wtr.add_image(
            f"range_image/b{i}",
            render_pcl_range_image([pts[mask]])[0],
            step,
        )

    # ------------------------------------------------------------------
    def export_flow(
        self,
        dataset: LidarDataset,
        out_dir,
        world_size: int = 1,
        worker_id: int = 0,
        skip_existing: bool = True,
        max_samples: Optional[int] = None,
    ):
        """run_inference_only: per-sample npz with the 6 flow grids."""
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        h, w = self.bev.grid_size
        n_done = 0
        for idx in range(len(dataset)):
            if idx % world_size != worker_id:
                continue
            if max_samples is not None and n_done >= max_samples:
                break
            s = dataset[idx]
            target = out_dir / f"{s.sample_id}.npz"
            if skip_existing and target.exists():
                continue
            arrays = {"bev_range_m": np.asarray(self.bev.bev_range_m)}
            # all 6 ordered pairs over (t0, t1, t2), like
            # experiment.py:386-456 (fw+bw per unordered pair)
            pairs = (("t0", "t1"), ("t0", "t2"), ("t1", "t2"))
            for a, b in pairs:
                try:
                    sp = dataset.get_pair(idx, a, b)
                except KeyError:
                    continue  # sample lacks this time key
                fs = FlowSample(
                    pcl_t0=PointCloud(
                        jnp.asarray(sp.frame_t0.pcl)[None],
                        jnp.asarray(sp.frame_t0.valid)[None],
                    ),
                    pcl_t1=PointCloud(
                        jnp.asarray(sp.frame_t1.pcl)[None],
                        jnp.asarray(sp.frame_t1.valid)[None],
                    ),
                    odom_t0_t1=jnp.asarray(sp.odom_t0_t1)[None],
                    odom_t1_t0=jnp.asarray(sp.odom_t1_t0)[None],
                )
                pred_fw, pred_bw = self.trainer.predict_step(self.state, fs)
                for name, pred, pcl, valid in (
                    (f"{a}_{b}", pred_fw, sp.frame_t0.pcl, sp.frame_t0.valid),
                    (f"{b}_{a}", pred_bw, sp.frame_t1.pcl, sp.frame_t1.valid),
                ):
                    cell, _, _ = point_cell_ids(
                        jnp.asarray(pcl[:, :2]), self.bev, jnp.asarray(valid)
                    )
                    flow_grid, _ = scatter_mean_grid(
                        jnp.asarray(pred.aggregated_flow[0][:, :2]),
                        cell,
                        self.bev.num_cells,
                    )
                    dyn_grid, _ = scatter_mean_grid(
                        jnp.asarray(pred.dynamicness[0][:, None]),
                        cell,
                        self.bev.num_cells,
                    )
                    arrays[f"bev_raw_flow_{name}"] = np.asarray(
                        flow_grid
                    ).reshape(h, w, 2)
                    arrays[f"bev_dynamicness_{name}"] = np.asarray(
                        dyn_grid
                    ).reshape(h, w)
            arrays["static_threshold"] = np.asarray(
                movavg_value(self.state.movavg)
            )
            np.savez_compressed(target, **arrays)
            n_done += 1
        return n_done
