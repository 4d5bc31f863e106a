"""Standalone pseudo-label mining / tracking CLI.

Behavioral reference: liso/tracker/tracking.py:main:114 — mine boxes over
whole dataset sequences with either the flow-cluster bootstrap (no
checkpoint) or a trained detector (--load_checkpoint), save the mined +
augmentation DBs, evaluate the mined boxes through the exact run_val
metrics path, and write a tracked-sequence GIF. Usage:

  python -m liso_tpu.cli.mining_cli -c kitti bev_100m_512 centerpoint liso \
      [--load_checkpoint DIR] [--world_size N --worker_id I] [--fast-test]
"""
from __future__ import annotations

import numpy as np

from liso_tpu.cli.common import (load_cfg_make_logdir, parse_cli_args,
                                  run_maybe_profiled)
from liso_tpu.cli.slim_cli import build_datasets, make_train_dataset
from liso_tpu.train.liso_loop import LisoSelfTraining


def _save_sequence_gif(loop, dataset, log_dir, max_frames: int = 20):
    """Tracked-boxes GIF of a mined sequence on disk (the mine() call logs
    the same frames as an animated TB summary, tracking.py:365-500, and
    caches them — reuse instead of re-rendering)."""
    from liso_tpu.visu.bbox_image import save_tracking_gif

    images = getattr(loop, "_last_seq_frames", None)
    if not images:
        images = loop.render_sequence_frames(dataset, max_frames=max_frames)
    if images:
        return save_tracking_gif(images, log_dir / "tracked_sequence.gif")
    return None


def main(argv=None):
    args = parse_cli_args(argv)
    cfg, log_dir = load_cfg_make_logdir(args, "mining")
    train_ds, val_ds, bev = build_datasets(
        cfg, args.fast_test, target="object"
    )
    dcfg = train_ds.cfg

    def factory(mined_db):
        return make_train_dataset(cfg, dcfg, args.fast_test, mined_db)

    loop = LisoSelfTraining(cfg, factory, val_ds, log_dir, data_cfg=dcfg)

    if args.load_checkpoint:
        # mine with the restored detector instead of the flow-cluster
        # bootstrap (tracking.py:697-732 uses the trained net per frame)
        import jax.numpy as jnp

        sample = train_ds[0]
        pts = jnp.asarray(sample.frame_t0.pcl)[None]
        valid = jnp.asarray(sample.frame_t0.valid)[None]
        step = loop.restore(args.load_checkpoint, pts, valid)
        loop.round_idx = 1  # force the detector mining path
        print(f"restored detector checkpoint at step {step}")

    def body():
        # gather=False: standalone mining workers publish their shard and
        # exit; DBs merge offline (each worker has its own log_dir). The
        # rounds loop (liso_cli) gathers in-process instead.
        loop.mine(
            train_ds, world_size=args.world_size, worker_id=args.worker_id,
            gather=False,
        )
        n_boxes = sum(
            len(v["track_id"]) for v in (loop.mined_db or {}).values()
        )
        # evaluate the mined DB through the run_val metrics path ON THE
        # MINED (train) SPLIT — mined boxes only exist for train samples
        # (tracking eval = run_val with the DB as predictor,
        # liso_cli.py:294-315)
        from liso_tpu.data.pipeline import Prefetcher
        from liso_tpu.eval.run_val import mined_db_predictor, run_val

        loader = Prefetcher(
            factory(None), batch_size=1, shuffle=False, num_workers=1
        )
        metrics = run_val(
            iter(loader),
            mined_db_predictor(loop.mined_db or {}),
            max_batches=4 if args.fast_test else None,
        )
        headline = {
            k: round(float(v), 4)
            for k, v in metrics.items()
            if k.startswith(("mAP", "AP_overall_overall"))
        }
        print("mined-box eval:", headline)
        gif = _save_sequence_gif(loop, train_ds, log_dir)
        print(
            f"mined {n_boxes} boxes; DBs in "
            f"{log_dir / f'mined_round_{loop.round_idx}'}"
            + (f"; GIF {gif}" if gif else "")
        )
        return metrics

    run_maybe_profiled(args, log_dir, body)
    print(f"done; logs in {log_dir}")
    return log_dir


if __name__ == "__main__":
    main()
