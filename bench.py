"""Benchmark: fused pillarize + SLIM-flow + CenterPoint-detect forward,
LiDAR frames/sec on one chip (BASELINE.json metric; north star >= 1000
pillarized frames/sec/chip on v4-8 — vs_baseline is fps / 1000).

Prints ONE JSON line. Shapes follow the reference's KITTI bev_100m_512
preset (liso_config.yml): 100 m x 100 m BEV at 512x512, ~16-32k points after
ground removal and range crop.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import argparse
    import os
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=0,
                    help="override BEV grid (e.g. 920 for the reference's "
                    "bev_120m_920 operating point)")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--peak-tf", type=float, default=177.0,
                    help="bf16 peak TFLOP/s for MFU accounting (this "
                    "virtualized chip's measured envelope ~177; v5e spec "
                    "197)")
    ap.add_argument("--peak-gbs", type=float, default=430.0,
                    help="HBM GB/s peak for bandwidth accounting "
                    "(virtualized envelope ~430 measured on 1 GB copy "
                    "chains; v5e spec 819)")
    args = ap.parse_args()

    import jax

    try:
        devices = jax.devices()
    except RuntimeError as e:  # TPU pool outage: re-exec on CPU so the
        # round-end bench still lands a (clearly-labeled) number
        if os.environ.get("LISO_BENCH_CPU_FALLBACK"):
            raise
        print(f"backend init failed ({e}); re-running on CPU",
              file=sys.stderr)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["LISO_BENCH_CPU_FALLBACK"] = "1"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    import jax.numpy as jnp

    from liso_tpu.models.box_learner import BoxLearner
    from liso_tpu.models.slim import SlimModel
    from liso_tpu.ops.bev import BevSetup

    on_tpu = any(d.platform == "tpu" for d in devices)
    if on_tpu:
        grid, n_pts, batch = 512, 32768, 8
    else:  # CPU smoke fallback so the bench always produces a number
        grid, n_pts, batch = 128, 4096, 1
    if args.grid:
        grid = args.grid
    if args.batch:
        batch = args.batch

    bev = BevSetup(bev_range_m=(100.0, 100.0), grid_size=(grid, grid))
    dtype = jnp.bfloat16 if on_tpu else None  # mixed precision on chip
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
    # jit the inits: eager init dispatches every op separately through the
    # TPU tunnel (~7 min for the pair); jitted it is one program (~30 s)
    slim_vars = jax.jit(slim.init)(key, pts0, valid, pts1, valid)
    det_vars = jax.jit(det.init)(key, pts0, valid)

    from liso_tpu.models.slim import SlimModel as _SM

    def encode(pts, vld):
        return slim.apply(
            slim_vars, pts, vld, method=_SM.encode_frame
        )

    from liso_tpu.models.pillar_encoder import (
        fused_scatter_images, prepare_pillar_inputs,
    )

    def fused_streaming(fmap_prev, cn_prev, pts, vld):
        """One streaming step: encode the NEW frame once, flow from the
        cached previous-frame features, detect on the new frame. The
        parameter-free pillar prep (cell sort, cluster means, feature
        assembly) is computed ONCE and shared by the SLIM and detector
        encoders, and their 64-channel PFN outputs are scattered to BEV
        with ONE fused C=128 kernel call (the one-hot matmul pads C to
        128 lanes, so this halves the scatter cost vs two C=65 calls —
        benchmarks/scatter_probe.py)."""
        prepared = prepare_pillar_inputs(pts, vld, bev)
        x_slim, _ = slim.apply(
            slim_vars, pts, vld, method=_SM.pillar_point_feats,
            prepared=prepared,
        )
        x_det, _ = det.apply(
            det_vars, pts, vld, point_feats_only=True, prepared=prepared
        )
        (img_s, img_d), occ = fused_scatter_images(
            [x_slim, x_det], prepared, bev
        )
        fmap, cn, _ = slim.apply(
            slim_vars, pts, vld, method=_SM.encode_frame,
            pillar_image=(img_s, occ),
        )
        out = slim.apply(
            slim_vars, fmap_prev, cn_prev, fmap,
            method=_SM.flow_from_features,
        )
        boxes, _, _, _ = det.apply(
            det_vars, pts, vld, pillar_image=(img_d, occ)
        )
        return fmap, cn, out[-1][..., 4:6], boxes.pos, boxes.probs

    # all iterations inside ONE jit with a serialising data dependency:
    # per-dispatch timing through the TPU tunnel is unreliable in both
    # directions (async queueing hides work; block_until_ready can even
    # return EARLY for shallow queues — see benchmarks/_timing.py). The
    # per-step cost is therefore the SLOPE between a low and a high
    # iteration count, each forced to true completion by materializing a
    # tiny output slice on the host.
    iters_lo, iters_hi = (6, 26) if on_tpu else (1, 3)

    def make_run(iters):
        @jax.jit
        def run(pts0, valid0, pts1, valid1):
            fmap0, cn0, _ = encode(pts0, valid0)

            def body(_, carry):
                fmap_prev, cn_prev, x = carry
                fmap, cn, flow, pos, probs = fused_streaming(
                    fmap_prev, cn_prev, x, valid1
                )
                x_next = pts1 + 0.0 * (flow.sum() + pos.sum() + probs.sum())
                return fmap, cn, x_next

            _, _, x = jax.lax.fori_loop(
                0, iters, body, (fmap0, cn0, pts1)
            )
            return x

        return run

    def timed(run):
        out = run(pts0, valid, pts1, valid)  # compile + warm
        jax.block_until_ready(out)
        np.asarray(out[0, 0])  # force true completion through the tunnel
        t0 = time.perf_counter()
        out = run(pts0, valid, pts1, valid)
        jax.block_until_ready(out)
        np.asarray(out[0, 0])
        return time.perf_counter() - t0

    def pallas_step_flops():
        """MXU FLOPs executed inside pallas kernels, which XLA cost
        analysis cannot see (custom calls are opaque). Two kernels run on
        this path:
          * fused corr lookup (ops/corr_fused_pallas): per RAFT iteration
            it recomputes corr rows for every /8 pixel against the whole
            pooled-f1 stack as [M, C] x [C, P_total] matmuls;
          * grid scatter-max (ops/grid_scatter_pallas): one-hot
            [tile, K] x [K, C] matmuls, one per 512-point chunk per
            covered grid tile; BOTH pillar encoders' features ride ONE
            fused C=128 call (fused_scatter_images).
        Chunk count is data-dependent; the contiguous sorted ranges bound
        it by n/K + n_tiles per sample, which uniform clouds saturate.
        """
        from liso_tpu.ops.corr_fused_pallas import corr_analytic_flops
        from liso_tpu.ops.grid_scatter_pallas import scatter_analytic_flops

        c8 = grid // 8
        corr = batch * 6 * corr_analytic_flops(c8, c8)  # 6 RAFT iters
        # ONE fused C=128 scatter per step (both encoders ride one call)
        scatter = batch * scatter_analytic_flops(grid * grid, n_pts, 128)
        return corr + scatter

    def step_time():
        t_lo = timed(make_run(iters_lo))
        t_hi = timed(make_run(iters_hi))
        # XLA counts a fori_loop body ONCE regardless of trip count, so
        # per-step cost comes from a loop-free single-step program
        # (compiled for analysis only); pallas custom calls are opaque to
        # the analysis and are added analytically (pallas_step_flops)
        single = jax.jit(fused_streaming).lower(
            jax.eval_shape(encode, pts0, valid)[0],
            jax.eval_shape(encode, pts0, valid)[1],
            pts1, valid,
        ).compile()
        ca = single.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) + pallas_step_flops()
        bytes_ = float(ca.get("bytes accessed", 0.0))
        return (t_hi - t_lo) / (iters_hi - iters_lo), flops, bytes_

    try:
        dt, flops_per_step, bytes_per_step = step_time()
    except Exception as e:  # pragma: no cover - chip-side failure path
        # fall back to the XLA gather lookup so the bench always lands a
        # number even if the MXU one-hot path miscompiles on this chip
        import os
        import sys

        print(f"mm-lookup path failed ({type(e).__name__}); retrying with "
              "LISO_DISABLE_PALLAS_LOOKUP=1", file=sys.stderr)
        os.environ["LISO_DISABLE_PALLAS_LOOKUP"] = "1"
        jax.clear_caches()
        dt, flops_per_step, bytes_per_step = step_time()

    fps = batch / dt
    tf_s = flops_per_step / dt / 1e12
    gb_s = bytes_per_step / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "fused_flow_detect_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": f"frames/s (grid {grid}, {n_pts} pts, batch {batch}, "
                f"{jax.devices()[0].platform})",
                "vs_baseline": round(fps / 1000.0, 4),
                # roofline accounting (XLA cost analysis of the compiled
                # step; peaks = this chip's measured envelope, see
                # --peak-tf/--peak-gbs): how far from speed-of-light
                "step_ms": round(dt * 1e3, 2),
                "gflop_per_step": round(flops_per_step / 1e9, 1),
                "achieved_tf_s": round(tf_s, 1),
                "mfu_pct": round(100 * tf_s / args.peak_tf, 1),
                # op-level bytes (XLA cost analysis): every op's operand +
                # result bytes, so an UPPER bound on HBM traffic (fusion
                # keeps much of it in registers/VMEM) — the roofline
                # denominator uses it as the conservative proxy
                "xla_op_gb_per_step_upper_bound": round(
                    bytes_per_step / 1e9, 3
                ),
                "op_bytes_upper_bound_gb_s": round(gb_s, 1),
                # NOTE: op-level bytes double-count fused/cached reads, so
                # this can exceed 100% — it is NOT achieved HBM bandwidth
                "op_bytes_upper_bound_vs_hbm_peak_pct": round(
                    100 * gb_s / args.peak_gbs, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
