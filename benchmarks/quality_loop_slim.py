"""The FULL zero-oracle LISO pipeline on a hermetic synthetic drive:

  1. train SLIM self-supervised on the drive (no labels, no GT flow),
  2. export per-sample BEV flow npz (train/slim_experiment.export_flow —
     the reference's run_inference_only, experiment.py:363-471),
  3. rebuild the dataset with flow_source="slim" + pred_flow_path so every
     per-point flow is gathered from the SLIM grids
     (data/dataset._slim_flow, reference torch_dataset_commons.py:590-675),
  4. run the LISO self-training rounds (mining + detector training) from
     that PREDICTED flow (reference liso_cli.py:180-272),

and records the quality curve (mined-DB AP / detector AP per round) plus
SLIM flow EPE/AccR before and after training. GT enters only as
measurement. `--flow oracle` runs the same rounds from the synthetic GT
flow instead (the r3 upper-bound arm) for a side-by-side gap statement.

Usage:
    python benchmarks/quality_loop_slim.py [--flow slim|oracle]
        [--rounds 6] [--steps-per-round 250] [--slim-steps 600]
        [--n-frames 60] [--n-objects 6] [--out /tmp/quality_loop_slim]
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flow", choices=("slim", "oracle"), default="slim")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--steps-per-round", type=int, default=250)
    ap.add_argument("--slim-steps", type=int, default=600)
    ap.add_argument("--slim-batch", type=int, default=4)
    ap.add_argument("--slim-lr", type=float, default=3e-4)
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--n-frames", type=int, default=60)
    ap.add_argument("--n-objects", type=int, default=6)
    ap.add_argument("--n-points", type=int, default=8192)
    ap.add_argument("--n-max", type=int, default=12288)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--num-iters", type=int, default=6)
    ap.add_argument("--drop-every", type=int, default=2,
                    help="drop_net_weights_every_nth_round (reference "
                    "default 2: OneCycle + reset span two rounds)")
    ap.add_argument("--out", type=str, default="/tmp/quality_loop_slim")
    args = ap.parse_args()

    from pathlib import Path

    import numpy as np

    from liso_tpu.data.dataset import DataCfg
    from liso_tpu.data.pipeline import Prefetcher
    from liso_tpu.data.synthetic import SyntheticDataset
    from liso_tpu.eval.run_val import mined_db_predictor, run_val
    from liso_tpu.ops.bev import BevSetup
    from liso_tpu.train.liso_loop import LisoSelfTraining
    from liso_tpu.utils.config import parse_config

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    bev = BevSetup((40.0, 40.0), (args.grid, args.grid))
    dcfg = DataCfg(
        # n_max < 16384 keeps every Prefetcher on threads — forking the
        # TPU-client parent process mid-run is not safe
        bev=bev, n_max=args.n_max, m_max=32768, k_max_boxes=16,
        use_skip_frames="never",
    )
    mk = dict(
        n_frames=args.n_frames, n_objects=args.n_objects,
        n_points=args.n_points, bounce_bound=16.0, cache_content=True,
        seed=0,
    )
    # measurement view of the SAME drive: GT flow, GT boxes, no injection
    eval_ds = SyntheticDataset(dcfg, **mk)

    result = {"flow": args.flow, "slim": None, "rounds": []}
    flow_dir = None

    if args.flow == "slim":
        # ---- phase 1: self-supervised SLIM on the drive ----------------
        from liso_tpu.train.slim_experiment import SlimExperiment

        slim_cfg = parse_config(
            "liso_tpu/config/liso_config.yml",
            extra_cfg_args=["slim_simple_knn_training"],
            key_value_updates=[
                ["SLIM", "batch_size", str(args.slim_batch)],
                ["SLIM", "model", "num_iters", str(args.num_iters)],
                ["SLIM", "iterations", "train", str(args.slim_steps)],
                ["SLIM", "iterations", "eval_every", "0"],
                ["SLIM", "learning_rate", "initial", str(args.slim_lr)],
                ["SLIM", "learning_rate", "warm_up", "step_length",
                 str(max(args.slim_steps // 10, 1))],
                ["checkpoint", "save_model_every", "0"],
                ["data", "num_workers", "0"],
            ],
        )
        slim_train_ds = SyntheticDataset(dcfg, **mk)
        exp = SlimExperiment(
            slim_cfg, bev, slim_train_ds, eval_ds, out_dir / "slim"
        )
        # "before" flow quality: untrained net
        import jax

        from liso_tpu.train.slim_experiment import batch_to_flow_sample

        loader = Prefetcher(
            slim_train_ds, batch_size=args.slim_batch, num_workers=0
        )
        fs0 = batch_to_flow_sample(next(iter(loader)))
        exp.state = exp.trainer.init_state(jax.random.PRNGKey(0), fs0)
        t0 = time.time()
        before = exp.evaluate(step=0, max_batches=10)
        print(f"SLIM before: {_fmt_flow(before)} ({time.time()-t0:.0f}s)",
              flush=True)
        t0 = time.time()
        # chunked training with intermediate flow-quality prints (each
        # exp.run(max_steps=n) call continues the persistent train state)
        chunk = max(args.slim_steps // 4, 1)
        done = 0
        while done < args.slim_steps:
            n_steps = min(chunk, args.slim_steps - done)
            exp.run(max_steps=n_steps)
            done += n_steps
            mid = exp.evaluate(step=done, max_batches=10)
            print(
                f"SLIM @{done}/{args.slim_steps}: {_fmt_flow(mid)} "
                f"({time.time()-t0:.0f}s)", flush=True,
            )
        train_s = time.time() - t0
        after = mid

        # ---- phase 2: flow export (reference npz schema) ----------------
        flow_dir = out_dir / "slim_flow"
        export_ds = SyntheticDataset(dcfg, **mk)
        t0 = time.time()
        n = exp.export_flow(export_ds, flow_dir, skip_existing=False)
        print(f"exported {n} flow npz in {time.time()-t0:.0f}s", flush=True)
        result["slim"] = {
            "steps": args.slim_steps,
            "train_s": round(train_s, 1),
            "before": {k: round(v, 4) for k, v in before.items()},
            "after": {k: round(v, 4) for k, v in after.items()},
            "n_exported": n,
        }

    # ---- phase 3: LISO rounds from the chosen flow ----------------------
    spr = args.steps_per_round
    cfg = parse_config(
        "liso_tpu/config/liso_config.yml",
        extra_cfg_args=["centerpoint"],
        key_value_updates=[
            ["optimization", "rounds", "active", "true"],
            ["optimization", "rounds", "steps_per_round", str(spr)],
            ["optimization", "rounds", "drop_net_weights_every_nth_round",
             str(args.drop_every)],
            ["optimization", "num_training_steps", str(args.rounds * spr)],
            ["optimization", "learning_rate", str(args.lr)],
            ["data", "batch_size", str(args.batch)],
            ["data", "num_workers", "0"],
            ["data", "tracking_cfg", "min_track_age", "3"],
            ["data", "tracking_cfg", "min_points_in_box", "8"],
            ["data", "tracking_cfg",
             "flow_cluster_detector_min_travel_dist_filter_m", "1.0"],
            ["validation", "val_every_n_steps", "0"],
            ["data", "augmentation", "boxes", "active", "true"],
            # keep mining recall bounded below by the flow-cluster
            # bootstrap's (tracker/mining.union_proposals): without it the
            # detector-only rounds ratchet recall monotonically downward
            # on this 60-frame drive (r5 first run: R@2m 0.503 -> 0.408
            # over rounds 1-4 with precision pinned at 1.000)
            ["optimization", "rounds", "mine_proposal_union", "true"],
        ],
    )
    mine_cfg = (
        dcfg._replace(flow_source="slim") if args.flow == "slim" else dcfg
    )

    def factory(mined_db):
        return SyntheticDataset(
            mine_cfg, mined_boxes_db=mined_db, pred_flow_path=flow_dir, **mk
        )

    loop = LisoSelfTraining(
        cfg, factory, eval_ds, out_dir / "loop", data_cfg=mine_cfg
    )

    def mined_precision_recall(mined_db, dist_m=2.0):
        """Set-level precision/recall of the mined DB vs GT at a center
        distance (VERDICT r3 item 5: log mined-DB precision/recall per
        round). Greedy nearest-unmatched matching per frame."""
        tp = n_mined_total = n_gt_total = 0
        for idx in range(len(eval_ds)):
            sid = eval_ds.sample_files[idx].stem
            gt = eval_ds.load_sample_dict(idx)["gt"]["boxes"]
            gt_pos = np.asarray(gt["pos"], np.float32)[:, :2]
            n_gt_total += len(gt_pos)
            entry = (mined_db or {}).get(sid)
            if entry is None:
                continue
            mined_pos = np.asarray(entry["raw_box"]["pos"], np.float32)[:, :2]
            n_mined_total += len(mined_pos)
            if not len(gt_pos) or not len(mined_pos):
                continue
            d = np.linalg.norm(
                mined_pos[:, None] - gt_pos[None, :], axis=-1
            )
            taken = np.zeros(len(gt_pos), bool)
            for i in np.argsort(d.min(axis=1)):
                j = int(np.argmin(np.where(taken, np.inf, d[i])))
                if not taken[j] and d[i, j] <= dist_m:
                    taken[j] = True
                    tp += 1
        return (
            tp / max(n_mined_total, 1),
            tp / max(n_gt_total, 1),
        )

    def eval_predictor(predict):
        loader = Prefetcher(eval_ds, batch_size=1, shuffle=False,
                            num_workers=0)
        m = run_val(iter(loader), predict)
        pre = "final_result/NUSC_OFFICIAL/detection_metrics/nusc/"
        return {
            "AP@2m": float(m.get(f"{pre}AP_movable_overall_dist@2.0", 0.0)),
            "mAP": float(m.get(f"{pre}mAP", 0.0)),
            "ATE": float(m.get(f"{pre}mATE", 0.0)),
            "AOE": float(m.get(f"{pre}mAOE", 0.0)),
        }

    t00 = time.time()
    for r in range(args.rounds):
        t0 = time.time()
        loop.run(total_steps=(r + 1) * spr, start_step=r * spr)
        train_s = time.time() - t0

        n_mined = sum(
            len(v["track_id"]) for v in (loop.mined_db or {}).values()
        )
        mined = (
            eval_predictor(mined_db_predictor(loop.mined_db))
            if loop.mined_db
            else {"AP@2m": 0.0, "mAP": 0.0, "ATE": 0.0, "AOE": 0.0}
        )

        mined_p, mined_r = mined_precision_recall(loop.mined_db)

        trainer, state = loop.trainer, loop.state
        import jax.numpy as jnp

        def det_predict(batch):
            boxes = trainer.predict_step(
                state, jnp.asarray(batch["pcl_t0"]),
                jnp.asarray(batch["valid_t0"]),
            )
            return {
                k: np.asarray(getattr(boxes, k))
                for k in ("pos", "dims", "rot", "probs", "velo", "valid")
            }

        det = eval_predictor(det_predict)
        row = {
            "round": r, "n_mined": n_mined,
            "mined_precision@2m": round(mined_p, 4),
            "mined_recall@2m": round(mined_r, 4),
            "mined_AP@2m": mined["AP@2m"], "mined_mAP": mined["mAP"],
            "det_AP@2m": det["AP@2m"], "det_mAP": det["mAP"],
            "det_ATE": det["ATE"], "det_AOE": det["AOE"],
            "train_s": round(train_s, 1),
        }
        result["rounds"].append(row)
        print(
            f"[{args.flow}] round {r}: mined {n_mined} boxes | mined P/R@2m "
            f"{mined_p:.3f}/{mined_r:.3f} AP@2m "
            f"{mined['AP@2m']:.3f} mAP {mined['mAP']:.3f} | detector "
            f"AP@2m {det['AP@2m']:.3f} mAP {det['mAP']:.3f} ATE "
            f"{det['ATE']:.2f} AOE {det['AOE']:.3f} | {train_s:.0f}s",
            flush=True,
        )

    final = result["rounds"][-1]
    result.update(
        {
            "metric": f"quality_loop_{args.flow}_det_AP@2m",
            "value": final["det_AP@2m"],
            "unit": f"AP@2m ({args.grid}^2 BEV, {args.rounds} rounds, "
                    f"{args.n_objects} objects, {args.n_frames} frames, "
                    f"{args.flow} flow)",
            "gt_boxes_in_eval": args.n_frames * args.n_objects,
            "total_s": round(time.time() - t00, 1),
        }
    )
    print(json.dumps(result))
    with open(out_dir / f"result_{args.flow}.json", "w") as f:
        json.dump(result, f, indent=1)


def _fmt_flow(m):
    return (
        f"EPE {m.get('AEE_overall', float('nan')):.3f} "
        f"(moving {m.get('AEE_moving', float('nan')):.3f}) "
        f"AccR {m.get('AccR_overall', float('nan')):.3f}"
    )


if __name__ == "__main__":
    main()
