"""SLIM training / flow-export CLI.

Behavioral reference: liso/slim/cli.py:12-64. Usage:
  python -m liso_tpu.cli.slim_cli -c slim_liso kitti [--fast-test]
  python -m liso_tpu.cli.slim_cli --inference-only --load_checkpoint DIR
"""
from __future__ import annotations

from pathlib import Path

from liso_tpu.cli.common import (load_cfg_make_logdir, parse_cli_args,
                                  run_maybe_profiled)
from liso_tpu.data.dataset import DataCfg
from liso_tpu.ops.bev import BevSetup


def build_datasets(cfg, fast_test: bool):
    bev = BevSetup(tuple(cfg.data.bev_range_m), tuple(cfg.data.img_grid_size))
    n_max = 4096 if fast_test else 65536
    dcfg = DataCfg(
        bev=bev,
        n_max=n_max,
        m_max=2 * n_max,
        use_skip_frames=str(cfg.data.use_skip_frames),
        flow_source=str(cfg.data.flow_source),
        odom_source=str(cfg.data.odom_source),
    )
    source = str(cfg.data.source)
    if source in ("toy", "synthetic"):
        from liso_tpu.data.synthetic import SyntheticDataset

        n_frames = 8 if fast_test else 64
        return (
            SyntheticDataset(dcfg, n_frames=n_frames, seed=0),
            SyntheticDataset(dcfg, n_frames=max(n_frames // 4, 2), seed=1),
            bev,
        )
    if source == "kitti":
        from liso_tpu.data.kitti import KittiRawDataset, KittiTrackingDataset

        root = Path(cfg.data.paths.kitti.local)
        train = KittiRawDataset(dcfg, root)
        try:
            val = KittiTrackingDataset(dcfg, root)
        except FileNotFoundError:
            val = None
        return train, val, bev
    raise NotImplementedError(source)


def main(argv=None):
    args = parse_cli_args(argv)
    cfg, log_dir = load_cfg_make_logdir(args, "slim")
    train_ds, val_ds, bev = build_datasets(cfg, args.fast_test)

    from liso_tpu.train.slim_experiment import SlimExperiment

    exp = SlimExperiment(cfg, bev, train_ds, val_ds, log_dir)
    if args.inference_only:
        assert args.load_checkpoint, "--inference-only needs --load_checkpoint"
        # init from one sample, then restore
        from liso_tpu.train.slim_experiment import batch_to_flow_sample
        from liso_tpu.data.dataset import collate
        import jax

        fs = batch_to_flow_sample(collate([train_ds[0]]))
        exp.state = exp.trainer.init_state(jax.random.PRNGKey(0), fs)
        exp.maybe_restore(args.load_checkpoint)
        n = exp.export_flow(
            train_ds,
            log_dir / "preds",
            world_size=args.world_size,
            worker_id=args.worker_id,
            max_samples=4 if args.fast_test else None,
        )
        print(f"exported flow for {n} samples to {log_dir / 'preds'}")
        return log_dir
    run_maybe_profiled(
        args, log_dir, lambda: exp.run(max_steps=3 if args.fast_test else None)
    )
    print(f"done; logs in {log_dir}")
    return log_dir


if __name__ == "__main__":
    main()
