"""SLIM train step at the reference's headline operating point:
920 x 920 BEV grid @ 120 m, batch 1, 6 RAFT iterations, fw+bw decode with
static aggregation (liso_config.yml:233,542-549 bev_120m_920 overlay).

Reports per-step wall time (slope-timed through the TPU tunnel like
bench.py), XLA cost analysis (FLOPs / bytes), the compiled program's
memory analysis, and the derived steps/s vs the reference's ~1.7 steps/s
on a V100 (BASELINE.md). Prints ONE JSON line and writes
docs/artifacts/slim_920_bench.json when run from the repo root.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/slim_920_bench.py
       [--grid 920] [--range-m 120] [--batch 1] [--n 65536]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=920)
    ap.add_argument("--range-m", type=float, default=120.0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--iters-lo", type=int, default=2)
    ap.add_argument("--iters-hi", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from liso_tpu.data.sample import FlowSample, PointCloud
    from liso_tpu.ops.bev import BevSetup
    from liso_tpu.train.slim_train import SlimTrainer

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if not on_tpu:  # CPU smoke: tiny stand-in so the driver always works
        args.grid, args.n, args.iters_lo, args.iters_hi = 64, 2048, 1, 2

    bev = BevSetup(
        bev_range_m=(args.range_m, args.range_m),
        grid_size=(args.grid, args.grid),
    )
    trainer = SlimTrainer(
        bev,
        num_iters=6,
        predict_weight_for_static_aggregation="sigmoid",
        use_static_aggr_flow_for_aggr_flow=True,
        # bf16 conv/matmul compute on chip (params/opt/loss stay f32):
        # halves activation HBM traffic at the 920^2 operating point
        compute_dtype=jnp.bfloat16 if on_tpu else None,
    )
    rng = np.random.RandomState(0)
    half = 0.5 * args.range_m - 2.0

    def mk():
        return PointCloud(
            pcl=jnp.asarray(
                rng.uniform(-half, half, (args.batch, args.n, 4)).astype(
                    np.float32
                )
            ),
            valid=jnp.ones((args.batch, args.n), bool),
        )

    eye = jnp.tile(jnp.eye(4)[None], (args.batch, 1, 1))
    sample = FlowSample(
        pcl_t0=mk(), pcl_t1=mk(), odom_t0_t1=eye, odom_t1_t0=eye
    )
    state = trainer.init_state(jax.random.PRNGKey(0), sample)

    def make_run(iters):
        def run(state, sample):
            def body(_, st):
                st, _ = trainer.train_step(st, sample)
                return st

            return jax.lax.fori_loop(0, iters, body, state)

        return jax.jit(run)

    def timed(compiled):
        out = compiled(state, sample)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        t0 = time.perf_counter()
        out = compiled(state, sample)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        return time.perf_counter() - t0

    lo, hi = args.iters_lo, args.iters_hi
    c_lo = make_run(lo).lower(state, sample).compile()
    c_hi = make_run(hi).lower(state, sample).compile()
    ca = c_hi.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) / hi
    bytes_ = float(ca.get("bytes accessed", 0.0)) / hi
    mem = {}
    try:
        ma = c_hi.memory_analysis()
        mem = {
            "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            "peak_mb": round(
                (
                    ma.argument_size_in_bytes
                    + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes
                )
                / 2**20,
                1,
            ),
        }
    except Exception as e:
        mem = {"error": str(e)[:80]}

    t_lo = timed(c_lo)
    t_hi = timed(c_hi)
    dt = (t_hi - t_lo) / (hi - lo)
    steps_s = 1.0 / dt
    result = {
        "metric": "slim_train_step_920",
        "value": round(steps_s, 3),
        "unit": (
            f"train steps/s (grid {args.grid} @ {args.range_m} m, batch "
            f"{args.batch}, {args.n} pts, fw+bw, 6 iters, "
            f"{jax.devices()[0].platform})"
        ),
        "vs_baseline": round(steps_s / 1.7, 3),  # reference V100 ~1.7/s
        "step_ms": round(dt * 1e3, 1),
        "gflop_per_step": round(flops / 1e9, 1),
        "gb_per_step": round(bytes_ / 1e9, 2),
        "memory": mem,
    }
    print(json.dumps(result))
    art = Path("docs/artifacts")
    if art.is_dir():
        with open(art / "slim_920_bench.json", "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
