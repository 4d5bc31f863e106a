"""Batch-scaling curve for the fused streaming step (VERDICT r3 item 2:
find the per-chip optimum batch for frames/s/chip).

Times the same fused encode+flow+detect step as bench.py at several batch
sizes in ONE process, slope method (low/high chained-iteration jits, each
forced to true completion). Prints one JSON line with the whole curve.

Usage: python benchmarks/batch_scaling.py [--batches 8,16,32] [--grid 512]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="8,16,32")
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--n-pts", type=int, default=32768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from liso_tpu.models.box_learner import BoxLearner
    from liso_tpu.models.pillar_encoder import prepare_pillar_inputs
    from liso_tpu.models.slim import SlimModel
    from liso_tpu.ops.bev import BevSetup

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    grid, n_pts = args.grid, args.n_pts
    if not on_tpu:
        grid, n_pts = 128, 4096

    bev = BevSetup(bev_range_m=(100.0, 100.0), grid_size=(grid, grid))
    dtype = jnp.bfloat16 if on_tpu else None
    slim = SlimModel(bev=bev, num_iters=6, compute_dtype=dtype)
    det = BoxLearner(
        bev, network="centerpoint", use_baseline_parameters=True,
        compute_dtype=dtype,
    )
    rng = np.random.RandomState(0)
    # init once at batch 1 (parameters are batch-independent)
    p1 = jnp.asarray(rng.uniform(-45, 45, (1, n_pts, 4)).astype(np.float32))
    v1 = jnp.ones((1, n_pts), bool)
    key = jax.random.PRNGKey(0)
    slim_vars = jax.jit(slim.init)(key, p1, v1, p1, v1)
    det_vars = jax.jit(det.init)(key, p1, v1)

    def fused_streaming(fmap_prev, cn_prev, pts, vld):
        prepared = prepare_pillar_inputs(pts, vld, bev)
        fmap, cn, _ = slim.apply(
            slim_vars, pts, vld, method=SlimModel.encode_frame,
            prepared=prepared,
        )
        out = slim.apply(
            slim_vars, fmap_prev, cn_prev, fmap,
            method=SlimModel.flow_from_features,
        )
        boxes, _, _, _ = det.apply(det_vars, pts, vld, prepared=prepared)
        return fmap, cn, out[-1][..., 4:6], boxes.pos, boxes.probs

    def make_run(iters, batch):
        @jax.jit
        def run(pts0, valid0, pts1, valid1):
            fmap0, cn0, _ = slim.apply(
                slim_vars, pts0, valid0, method=SlimModel.encode_frame
            )

            def body(_, carry):
                fmap_prev, cn_prev, x = carry
                fmap, cn, flow, pos, probs = fused_streaming(
                    fmap_prev, cn_prev, x, valid1
                )
                x_next = pts1 + 0.0 * (flow.sum() + pos.sum() + probs.sum())
                return fmap, cn, x_next

            _, _, x = jax.lax.fori_loop(0, iters, body, (fmap0, cn0, pts1))
            return x

        return run

    def timed(run, a):
        out = run(*a)
        jax.block_until_ready(out)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        out = run(*a)
        jax.block_until_ready(out)
        np.asarray(out[0, 0])
        return time.perf_counter() - t0

    lo, hi = (4, 16) if on_tpu else (1, 3)
    curve = []
    for batch in [int(x) for x in args.batches.split(",")]:
        pts0 = jnp.asarray(
            rng.uniform(-45, 45, (batch, n_pts, 4)).astype(np.float32)
        )
        pts1 = jnp.asarray(
            rng.uniform(-45, 45, (batch, n_pts, 4)).astype(np.float32)
        )
        valid = jnp.ones((batch, n_pts), bool)
        a = (pts0, valid, pts1, valid)
        t_lo = timed(make_run(lo, batch), a)
        t_hi = timed(make_run(hi, batch), a)
        dt = (t_hi - t_lo) / (hi - lo)
        fps = batch / dt
        curve.append(
            {"batch": batch, "step_ms": round(dt * 1e3, 2),
             "frames_per_s": round(fps, 1)}
        )
        print(f"batch {batch}: {dt*1e3:.2f} ms/step -> {fps:.1f} f/s",
              flush=True)

    best = max(curve, key=lambda r: r["frames_per_s"])
    print(json.dumps({
        "metric": "batch_scaling_fused_step",
        "grid": grid, "n_pts": n_pts, "curve": curve,
        "best_batch": best["batch"],
        "best_frames_per_s": best["frames_per_s"],
    }))


if __name__ == "__main__":
    main()
