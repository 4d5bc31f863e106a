"""MFU / bandwidth accounting for the two headline workloads.

For (a) the fused streaming flow+detect forward (bench.py's metric) and
(b) the SLIM train step (fwd+bwd, batch 2), this reports:

  * compiled FLOPs + bytes accessed from XLA cost analysis,
  * measured wall time (chained iterations inside one jit, like bench.py),
  * MFU vs the chip's bf16 peak and achieved HBM bandwidth.

Peaks default to v5e spec (197 TF/s bf16, 819 GB/s HBM) and can be
overridden for the virtualized environment, whose measured envelope is
~170 TF/s / ~157 GB/s (docs/STATUS.md round-2 findings):

    python benchmarks/mfu_bench.py --peak-tf 170 --peak-gbs 157
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _timed_once(fn, args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])  # force true completion (tunnel)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])
    return time.perf_counter() - t0


def _slope_compiled(make_run, args, lo, hi, single=None):
    """(per-iter seconds, flops/iter, bytes/iter) via the slope between a
    lo- and hi-iteration chained run (tunnel-safe: block_until_ready alone
    can return early). XLA cost analysis counts a fori_loop body ONCE
    regardless of trip count, so per-step cost must come from `single`, a
    loop-free one-step Lowered program (compiled for analysis only);
    without one, flops/bytes are reported as 0 rather than a wrong split.
    Pallas custom calls are opaque to the analysis either way — callers
    add those analytically."""
    c_lo = make_run(lo).lower(*args).compile()
    c_hi = make_run(hi).lower(*args).compile()
    if single == "lo":  # lo chain has trip count 1 -> exact single-step cost
        flops, bytes_ = _cost(c_lo)
    elif single is not None:
        flops, bytes_ = _cost(single.compile())
    else:
        flops, bytes_ = 0.0, 0.0
    t_lo = _timed_once(c_lo, args)
    t_hi = _timed_once(c_hi, args)
    dt = (t_hi - t_lo) / (hi - lo)
    return dt, flops, bytes_


def bench_fused_forward(grid, n_pts, batch, iters, on_tpu):
    import jax
    import jax.numpy as jnp

    from liso_tpu.models.box_learner import BoxLearner
    from liso_tpu.models.slim import SlimModel
    from liso_tpu.ops.bev import BevSetup

    bev = BevSetup(bev_range_m=(100.0, 100.0), grid_size=(grid, grid))
    dtype = jnp.bfloat16 if on_tpu else None
    slim = SlimModel(bev=bev, num_iters=6, compute_dtype=dtype)
    det = BoxLearner(
        bev, network="centerpoint", use_baseline_parameters=True,
        compute_dtype=dtype,
    )
    rng = np.random.RandomState(0)
    pts0 = jnp.asarray(rng.uniform(-45, 45, (batch, n_pts, 4)).astype(np.float32))
    pts1 = jnp.asarray(rng.uniform(-45, 45, (batch, n_pts, 4)).astype(np.float32))
    valid = jnp.ones((batch, n_pts), bool)
    key = jax.random.PRNGKey(0)
    slim_vars = jax.jit(slim.init)(key, pts0, valid, pts1, valid)
    det_vars = jax.jit(det.init)(key, pts0, valid)

    SM = type(slim)

    def step(fmap_prev, cn_prev, pts, vld):
        fmap, cn, _ = slim.apply(slim_vars, pts, vld, method=SM.encode_frame)
        out = slim.apply(
            slim_vars, fmap_prev, cn_prev, fmap, method=SM.flow_from_features
        )
        boxes, _, _, _ = det.apply(det_vars, pts, vld)
        return fmap, cn, out[-1][..., 4:6], boxes.pos, boxes.probs

    def make_run(iters):
        @jax.jit
        def run(pts0, valid0, pts1, valid1):
            fmap0, cn0, _ = slim.apply(
                slim_vars, pts0, valid0, method=SM.encode_frame
            )

            def body(_, carry):
                fmap_prev, cn_prev, x = carry
                fmap, cn, flow, pos, probs = step(
                    fmap_prev, cn_prev, x, valid1
                )
                x_next = pts1 + 0.0 * (flow.sum() + pos.sum() + probs.sum())
                return fmap, cn, x_next

            _, _, x = jax.lax.fori_loop(0, iters, body, (fmap0, cn0, pts1))
            return x

        return run

    lo, hi = iters
    fm, cn, _ = jax.eval_shape(
        lambda p, v: slim.apply(slim_vars, p, v, method=SM.encode_frame),
        pts0, valid,
    )
    single = jax.jit(step).lower(fm, cn, pts1, valid)
    dt, flops, bytes_ = _slope_compiled(
        make_run, (pts0, valid, pts1, valid), lo, hi, single=single
    )
    # the fwd step runs: one SLIM encode_frame (C=65 scatter), one flow
    # pass (6 corr lookups), and one detector encode (a second C=65
    # scatter — this bench path does not share the fused scatter)
    flops += pallas_corr_flops(batch, grid)
    flops += 2 * pallas_scatter_flops(batch, grid, n_pts, 65)
    return flops, bytes_, dt


def pallas_corr_flops(batch, grid, raft_iters=6):
    """MXU FLOPs of the fused corr lookup kernel for ONE flow pass
    (raft_iters window lookups). Geometry comes from the kernel module
    itself (ops/corr_fused_pallas.corr_analytic_flops) so the accounting
    can never drift from the kernel's actual tiling."""
    from liso_tpu.ops.corr_fused_pallas import corr_analytic_flops

    c8 = grid // 8
    return batch * raft_iters * corr_analytic_flops(c8, c8)


def pallas_scatter_flops(batch, grid, n_pts, channels):
    """MXU FLOPs of ONE grid scatter call (per-encoder C=65, or fused
    C=128). Tile selection comes from the kernel module itself."""
    from liso_tpu.ops.grid_scatter_pallas import scatter_analytic_flops

    return batch * scatter_analytic_flops(grid * grid, n_pts, channels)


def bench_slim_train(grid, n_pts, batch, iters, on_tpu):
    import jax
    import jax.numpy as jnp

    from liso_tpu.data.sample import FlowSample, PointCloud
    from liso_tpu.ops.bev import BevSetup
    from liso_tpu.train.slim_train import SlimTrainer

    bev = BevSetup(bev_range_m=(100.0, 100.0), grid_size=(grid, grid))
    trainer = SlimTrainer(
        bev,
        num_iters=6,
        predict_weight_for_static_aggregation="sigmoid",
        use_static_aggr_flow_for_aggr_flow=True,
    )
    rng = np.random.RandomState(0)
    mk = lambda: PointCloud(
        pcl=jnp.asarray(
            rng.uniform(-45, 45, (batch, n_pts, 4)).astype(np.float32)
        ),
        valid=jnp.ones((batch, n_pts), bool),
    )
    eye = jnp.tile(jnp.eye(4)[None], (batch, 1, 1))
    sample = FlowSample(pcl_t0=mk(), pcl_t1=mk(), odom_t0_t1=eye, odom_t1_t0=eye)
    state = trainer.init_state(jax.random.PRNGKey(0), sample)

    def make_run(iters):
        @jax.jit
        def run(state, sample):
            def body(_, st):
                st, _ = trainer.train_step(st, sample)
                return st

            return jax.lax.fori_loop(0, iters, body, state)

        return run

    # lo is forced to 1: XLA cost analysis counts a fori_loop body ONCE,
    # so the lo chain with trip count 1 doubles as an EXACT single-step
    # cost program — no third train-step compile (each costs minutes)
    _, hi = iters
    lo = 1
    dt, flops, bytes_ = _slope_compiled(
        make_run, (state, sample), lo, hi, single="lo"
    )
    # pallas accounting, per kernel and per actual run count in the SLIM
    # train step (NO detector runs here):
    #   corr — one flow pass per direction (fw + bw), backward kernel is
    #   ~2x the fwd matmul work (two MXU matmuls vs one) => 2 dirs x 3;
    #   scatter — both frames are encoded (2 C=65 calls), backward is
    #   ~2x fwd (gather + winner-mask gather) => 2 encodes x 3.
    # The kNN loss kernel is NOT counted (data-dependent band pruning) —
    # a lower bound.
    flops += 2 * 3 * pallas_corr_flops(batch, grid)
    flops += 2 * 3 * pallas_scatter_flops(batch, grid, n_pts, 65)
    return flops, bytes_, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak-tf", type=float, default=197.0,
                    help="bf16 peak TFLOP/s (v5e spec 197)")
    ap.add_argument("--peak-gbs", type=float, default=819.0,
                    help="HBM peak GB/s (v5e spec 819)")
    ap.add_argument("--grid", type=int, default=0)
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--only", type=str, default="",
                    help="'fwd' or 'train' to run one workload")
    args = ap.parse_args()

    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        grid, n_pts, fb, tb, iters = 512, 32768, 8, 2, (6, 26)
    else:
        grid, n_pts, fb, tb, iters = 128, 4096, 1, 1, (1, 3)
    if args.grid:
        grid = args.grid
    if args.iters:
        iters = (max(1, args.iters // 4), args.iters)

    rows = []
    if args.only in ("", "fwd"):
        f, b, dt = bench_fused_forward(grid, n_pts, fb, iters, on_tpu)
        rows.append(("fused fwd (flow+detect)", fb, f, b, dt))
    if args.only in ("", "train"):
        # train steps are ~10x a forward; shorter chains keep compiles sane
        ti = (max(1, iters[0] // 3), max(2, iters[1] // 3))
        f, b, dt = bench_slim_train(grid, n_pts, tb, ti, on_tpu)
        rows.append(("slim train step (fwd+bwd)", tb, f, b, dt))

    print(
        f"{'workload':<28}{'batch':>6}{'GFLOP':>10}{'GB':>8}{'ms':>9}"
        f"{'TF/s':>8}{'MFU%':>7}{'GB/s':>8}{'HBM%':>7}"
    )
    for name, bsz, flops, bytes_, dt in rows:
        tfs = flops / dt / 1e12
        gbs = bytes_ / dt / 1e9
        print(
            f"{name:<28}{bsz:>6}{flops / 1e9:>10.1f}{bytes_ / 1e9:>8.2f}"
            f"{dt * 1e3:>9.1f}{tfs:>8.1f}{100 * tfs / args.peak_tf:>7.1f}"
            f"{gbs:>8.1f}{100 * gbs / args.peak_gbs:>7.1f}"
        )


if __name__ == "__main__":
    main()
