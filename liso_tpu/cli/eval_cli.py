"""Standalone evaluation CLI.

Behavioral reference: liso/eval/eval_ours.py:main:759-872 — evaluate a
trained detector checkpoint, a mined-box DB, the flow-cluster bootstrap, or
the echo_gt oracle through the same run_val metrics path.

  python -m liso_tpu.cli.eval_cli -c kitti centerpoint \
      --load_checkpoint DIR            # trained detector
  python -m liso_tpu.cli.eval_cli --mined_db tracked.npz ...
  python -m liso_tpu.cli.eval_cli --override_network echo_gt ...
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.cli.common import load_cfg_make_logdir, parse_cli_args
from liso_tpu.cli.slim_cli import build_datasets
from liso_tpu.data.pipeline import Prefetcher
from liso_tpu.eval.run_val import mined_db_predictor, run_val


def gt_echo_predictor(batch):
    """echo_gt oracle (simple_net.py:78-82): return the GT boxes."""
    return {k: np.asarray(v) for k, v in batch["gt_boxes"].items()}


def main(argv=None):
    base = argparse.ArgumentParser(add_help=False)
    base.add_argument("--mined_db", default=None)
    base.add_argument("--override_network", default=None,
                      choices=[None, "echo_gt", "flow_cluster_detector"])
    extra, rest = base.parse_known_args(argv)
    args = parse_cli_args(rest)
    cfg, log_dir = load_cfg_make_logdir(args, "eval")
    _, val_ds, bev = build_datasets(cfg, args.fast_test)
    if val_ds is None:
        raise SystemExit("no validation dataset for this source")
    loader = Prefetcher(val_ds, batch_size=1, shuffle=False, num_workers=2)

    if extra.mined_db:
        from liso_tpu.tracker.dbs import load_mined_boxes_db

        predict = mined_db_predictor(load_mined_boxes_db(extra.mined_db))
    elif extra.override_network == "echo_gt":
        predict = gt_echo_predictor
    elif extra.override_network == "flow_cluster_detector":
        from liso_tpu.models.flow_cluster_detector import (
            FlowClusterCfg,
            detect_boxes_from_flow,
        )
        from liso_tpu.ops.bev import point_cell_ids

        fc_cfg = FlowClusterCfg()

        def predict(batch):
            b = len(batch["sample_id"])
            outs = []
            for i in range(b):
                pcl = jnp.asarray(batch["pcl_t0"][i])
                v = jnp.asarray(batch["valid_t0"][i])
                cell, _, _ = point_cell_ids(pcl[:, :2], bev, v)
                boxes = detect_boxes_from_flow(
                    pcl, v, cell, jnp.asarray(batch["flow_t0_t1"][i]),
                    jnp.asarray(batch["odom_t0_t1"][i]), pcl, v,
                    jnp.asarray(batch["time_delta_s"][i]), bev, fc_cfg,
                )
                outs.append(boxes)
            stacked = jax.tree.map(lambda *x: jnp.stack(x), *outs)
            return {
                k: np.asarray(getattr(stacked, k))
                for k in ("pos", "dims", "rot", "probs", "velo", "valid")
            }
    else:
        from liso_tpu.train.liso_loop import LisoSelfTraining

        loop = LisoSelfTraining(
            cfg, lambda db: val_ds, val_ds, log_dir, data_cfg=val_ds.cfg
        )
        trainer = loop.trainer
        sample = val_ds[0]
        pts = jnp.asarray(sample.frame_t0.pcl)[None]
        vld = jnp.asarray(sample.frame_t0.valid)[None]
        state = trainer.init_state(jax.random.PRNGKey(0), pts, vld)
        if args.load_checkpoint:
            from liso_tpu.utils.checkpoint import latest_step, restore_checkpoint

            step = latest_step(args.load_checkpoint)
            assert step is not None, args.load_checkpoint
            state = restore_checkpoint(args.load_checkpoint, step, state)

        def predict(batch):
            boxes = trainer.predict_step(
                state, jnp.asarray(batch["pcl_t0"]),
                jnp.asarray(batch["valid_t0"]),
            )
            return {
                k: np.asarray(getattr(boxes, k))
                for k in ("pos", "dims", "rot", "probs", "velo", "valid")
            }

    family = str(cfg.data.source)
    class_names = {
        "kitti": ("Car", "Pedestrian", "Cyclist"),
        "nuscenes": None,  # wrapper uses the official class table
        "waymo": ("VEHICLE", "PEDESTRIAN", "CYCLIST"),
        "av2": ("REGULAR_VEHICLE", "PEDESTRIAN", "BICYCLIST"),
    }.get(family)
    from liso_tpu.utils.tb import TBFactory

    metrics = run_val(
        iter(loader), predict,
        moving_velocity_thresh=float(
            cfg.validation.obj_is_moving_velocity_thresh
        ),
        dataset_family=family,
        movable_class_names=class_names,
        kitti_annotated_fov_filter=(family == "kitti"),
        max_batches=4 if args.fast_test else None,
        writer=TBFactory(log_dir / "tb")("eval"),
        # 0 disables image panels (headless bulk eval)
        log_images_num_batches=int(
            getattr(cfg.logging, "max_log_img_batches", 2)
        ),
        bev_range_m=tuple(cfg.data.bev_range_m),
        # devkit-style per-class summary-plot PNGs next to the TB logs
        summary_plot_dir=log_dir / "plots",
    )
    for k in sorted(metrics):
        print(f"{k}: {metrics[k]:.4f}")
    return metrics


if __name__ == "__main__":
    main()
