"""Round-over-round self-training quality curve on a harder synthetic.

VERDICT r2 item 7: the round-2 closed-loop evidence was a single snapshot
(64 px BEV, 2 rounds, AP@2m 0.57). This driver runs the full zero-label
LISO loop (reference liso_cli.py:294-315 per-round mined-DB eval analogue)
on a harder hermetic drive — 256^2 BEV, long sequence, many bouncing
objects — for >= 3 mining rounds and records the quality curve:

  * AP@2m / mAP of the MINED DB after each round's mining pass,
  * AP@2m / mAP of the TRAINED DETECTOR at each round's end,

evaluated against GT on the drive itself (no human label enters training;
GT is used only for measurement). Prints a table plus one JSON line.

Usage (TPU or CPU):
    python benchmarks/quality_loop.py [--rounds 4] [--steps-per-round 250]
        [--grid 256] [--n-frames 48] [--n-objects 6] [--batch 4]
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--steps-per-round", type=int, default=250)
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--n-frames", type=int, default=48)
    ap.add_argument("--n-objects", type=int, default=6)
    ap.add_argument("--n-points", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", type=str, default="/tmp/quality_loop")
    args = ap.parse_args()

    from pathlib import Path

    import numpy as np

    from liso_tpu.data.dataset import DataCfg
    from liso_tpu.data.synthetic import SyntheticDataset
    from liso_tpu.data.pipeline import Prefetcher
    from liso_tpu.eval.run_val import mined_db_predictor, run_val
    from liso_tpu.ops.bev import BevSetup
    from liso_tpu.train.liso_loop import LisoSelfTraining
    from liso_tpu.utils.config import parse_config

    spr = args.steps_per_round
    cfg = parse_config(
        "liso_tpu/config/liso_config.yml",
        extra_cfg_args=["centerpoint"],
        key_value_updates=[
            ["optimization", "rounds", "active", "true"],
            ["optimization", "rounds", "steps_per_round", str(spr)],
            # reference default: fresh net every round, mined DB carries
            # the learning signal across rounds
            ["optimization", "rounds", "drop_net_weights_every_nth_round", "1"],
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
        ],
    )

    bev = BevSetup((40.0, 40.0), (args.grid, args.grid))
    dcfg = DataCfg(
        # n_max < 16384 keeps every Prefetcher on threads — forking the
        # TPU-client parent process mid-run is not safe
        bev=bev, n_max=12288, m_max=32768, k_max_boxes=16,
        use_skip_frames="never",
    )
    mk = dict(
        n_frames=args.n_frames, n_objects=args.n_objects,
        n_points=args.n_points, bounce_bound=16.0, cache_content=True,
        seed=0,
    )

    def factory(mined_db):
        return SyntheticDataset(dcfg, mined_boxes_db=mined_db, **mk)

    # measurement view of the SAME drive: no mined-box injection, no augm
    eval_ds = SyntheticDataset(dcfg, **mk)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    loop = LisoSelfTraining(cfg, factory, eval_ds, out_dir, data_cfg=dcfg)

    def eval_predictor(predict, tag):
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

    rows = []
    t00 = time.time()
    for r in range(args.rounds):
        t0 = time.time()
        loop.run(total_steps=(r + 1) * spr, start_step=r * spr)
        train_s = time.time() - t0

        n_mined = sum(
            len(v["track_id"]) for v in (loop.mined_db or {}).values()
        )
        mined = (
            eval_predictor(mined_db_predictor(loop.mined_db), "mined")
            if loop.mined_db
            else {"AP@2m": 0.0, "mAP": 0.0, "ATE": 0.0, "AOE": 0.0}
        )

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

        det = eval_predictor(det_predict, "detector")
        rows.append(
            {
                "round": r, "n_mined": n_mined,
                "mined_AP@2m": mined["AP@2m"], "mined_mAP": mined["mAP"],
                "det_AP@2m": det["AP@2m"], "det_mAP": det["mAP"],
                "det_ATE": det["ATE"], "det_AOE": det["AOE"],
                "train_s": round(train_s, 1),
            }
        )
        print(
            f"round {r}: mined {n_mined} boxes | mined AP@2m "
            f"{mined['AP@2m']:.3f} mAP {mined['mAP']:.3f} | detector "
            f"AP@2m {det['AP@2m']:.3f} mAP {det['mAP']:.3f} ATE "
            f"{det['ATE']:.2f} AOE {det['AOE']:.3f} | {train_s:.0f}s",
            flush=True,
        )

    final = rows[-1]
    print(json.dumps({
        "metric": "quality_loop_det_AP@2m",
        "value": final["det_AP@2m"],
        "unit": f"AP@2m ({args.grid}^2 BEV, {args.rounds} rounds, "
                f"{args.n_objects} objects, {args.n_frames} frames)",
        "rounds": rows,
        "total_s": round(time.time() - t00, 1),
    }))


if __name__ == "__main__":
    main()
