"""Mining-round wall-clock at realistic scale (VERDICT r2 item 5).

Runs mine_sequence over a synthetic drive of --frames frames at the full
512^2 BEV / 32k-point scale with the trained-detector path (CenterPoint
predict_step, chunked batch-8 mining inference) and reports frames/s plus
the host/device split. The reference mines at batch 1 per frame through a
DataLoader (tracking.py:639-644); this measures our batched equivalent.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/mining_bench.py
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--objects", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from liso_tpu.ops.bev import BevSetup
    from liso_tpu.tracker.mining import Frame, MiningCfg, mine_sequence
    from liso_tpu.train.detector_train import DetectorTrainer

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if not on_tpu:
        args.frames, args.grid, args.n = 12, 128, 4096
    g, n, b = args.grid, args.n, args.batch
    bev = BevSetup((100.0, 100.0), (g, g))
    dtype = jnp.bfloat16 if on_tpu else None

    rng = np.random.RandomState(0)

    # synthetic drive: static background + a few constant-velocity objects
    bg = rng.uniform(-45, 45, (n - 256 * args.objects, 3)).astype(np.float32)
    bg[:, 2] = rng.uniform(-1.0, 1.5, len(bg))
    obj_pos = rng.uniform(-30, 30, (args.objects, 3)).astype(np.float32)
    obj_pos[:, 2] = 0.0
    obj_vel = rng.uniform(-1.2, 1.2, (args.objects, 3)).astype(np.float32)
    obj_vel[:, 2] = 0.0
    obj_pts = rng.normal(0, 0.9, (args.objects, 256, 3)).astype(np.float32)

    def make_frame(t):
        clouds = [bg]
        flows = [np.zeros_like(bg)]
        for o in range(args.objects):
            c = obj_pts[o] + obj_pos[o] + obj_vel[o] * (t * 0.1)
            clouds.append(c)
            flows.append(np.tile(obj_vel[o] * 0.1, (256, 1)))
        pcl = np.concatenate(clouds).astype(np.float32)
        pcl = np.concatenate([pcl, np.ones((len(pcl), 1), np.float32)], 1)
        flow = np.concatenate(flows).astype(np.float32)
        return Frame(
            sample_id=f"f{t:04d}",
            pcl=pcl,
            valid=np.ones(len(pcl), bool),
            flow=flow,
            odom_ta_tb=np.eye(4, dtype=np.float32),
        )

    frames = [make_frame(t) for t in range(args.frames)]

    del dtype  # trainer threads its own compute dtype per-backend
    trainer = DetectorTrainer(bev, network="centerpoint")
    pts0 = jnp.asarray(frames[0].pcl[None])
    val0 = jnp.asarray(frames[0].valid[None])
    state = trainer.init_state(jax.random.PRNGKey(0), pts0, val0)

    def detect_batch_fn(fs):
        out = []
        for i in range(0, len(fs), b):
            chunk = list(fs[i : i + b])
            n_real = len(chunk)
            while len(chunk) < b:
                chunk = chunk + [chunk[-1]]
            pts = jnp.asarray(np.stack([f.pcl for f in chunk]))
            valid = jnp.asarray(np.stack([f.valid for f in chunk]))
            boxes = jax.device_get(trainer.predict_step(state, pts, valid))
            out.extend(
                jax.tree.map(lambda x: x[j], boxes) for j in range(n_real)
            )
        return out

    cfg = MiningCfg(
        is_flow_cluster_detector=False,
        align_yaw_with_motion=True,
        dims_quantile=0.6,
        min_points_in_box=10,
    )

    # warm the compiled programs on a 2-frame slice so the measured pass is
    # steady-state (mining reuses ONE compiled shape per program)
    mine_sequence(frames[:2], None, cfg, bev, detect_batch_fn=detect_batch_fn)

    t0 = time.perf_counter()
    res = mine_sequence(frames, None, cfg, bev, detect_batch_fn=detect_batch_fn)
    dt = time.perf_counter() - t0
    print(
        f"mining: {args.frames} frames (grid {g}, {n} pts, detect batch {b})"
        f" in {dt:.1f}s -> {args.frames / dt:.1f} frames/s,"
        f" {res['num_tracks']} tracks"
    )


if __name__ == "__main__":
    main()
