"""Stage-level roofline for the fused inference step (bench.py's metric):
measured per-stage time vs an analytical floor on THIS chip's envelope.

Floor model (documented, deliberately optimistic so 'saturated' claims
stay conservative):
  * every conv/matmul reads its input once and writes its output once in
    its compute dtype; BN / relu / residual-add / bias fuse into the
    producing op for free; weights are ignored (<< activations here);
  * conv MXU time is charged at TILE-QUANTIZED flops: the MXU contracts
    in 128-wide passes on both the reduction (k^2*Cin) and the output-
    channel dim, so a Cout=48 conv occupies the array like a Cout=128
    one (2.67x the ideal flops). The reference's channel widths
    (48/96/144 encoder, 64 RPN stage-1) under-fill the array — the
    quantized floor is what THIS model can achieve on THIS hardware;
    the ideal-flops floor is also reported (floor_mxu_ideal_ms) so the
    architecture-tax is visible per stage (round-4's floors used ideal
    flops only, which is unreachable and made conv stages look 2-3x off
    the wall);
  * per-op floor = max(bytes / HBM_GBs, flops_q / PEAK_TFs); stage floor
    = sum over its ops (XLA does not fuse conv->conv, so sequential
    convs each pay their I/O — this is the *XLA-achievable* floor; a
    perfectly fused handwritten kernel could go below it);
  * pallas kernels are charged their actual HBM blocks;
  * prep's sort/scan passes run VMEM-resident (b*n*6*4B << 128 MB), so
    they are charged one HBM round trip plus comparator work on the VPU
    (bitonic: log2(n)*(log2(n)+1)/2 stages; segmented scan: 2*log2(n)
    passes) at --vpu-tops.

measured/floor >> 1 for a stage = real headroom (latency- or
occupancy-bound, not bandwidth-bound); ~1-1.5x = at the wall, stop
optimizing blind. Envelope defaults are this host's measured numbers
(round-5 chained probes, docs/STATUS.md: 1 GB copy chains sustain
~415-450 GB/s and an 8192^2 bf16 matmul chain 177 TF/s — the round-2
probe's 157 GB/s was an artifact of host-side array init shipping data
through the tunnel, and produced floors ABOVE measured times for rpn,
VERDICT r4 weak 4).

Prints a table + ONE JSON line; writes docs/artifacts/roofline_r5.json
when run from the repo root.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/roofline.py
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from benchmarks._timing import chain_slope

BF2 = 2  # bf16 bytes
F4 = 4


def _pad128(x):
    return -(-x // 128) * 128


def conv_cost(b, h_in, cin, cout, k=3, stride=1, in_bytes=BF2, out_bytes=BF2):
    """(bytes, flops_quantized, flops_ideal) for one conv. flops_quantized
    charges the MXU's 128-wide pass granularity on the contraction
    (k^2*Cin) and output-channel dims (module docstring)."""
    h_out = h_in // stride
    bytes_ = b * h_in * h_in * cin * in_bytes + b * h_out * h_out * cout * out_bytes
    flops_i = 2.0 * b * h_out * h_out * k * k * cin * cout
    flops_q = 2.0 * b * h_out * h_out * _pad128(k * k * cin) * _pad128(cout)
    # 4-vector: [hbm_bytes, mxu_flops_quantized, mxu_flops_ideal, vpu_ops]
    return np.array([bytes_, flops_q, flops_i, 0.0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak-tf", type=float, default=177.0)
    ap.add_argument("--peak-gbs", type=float, default=430.0)
    ap.add_argument("--vpu-tops", type=float, default=4.0,
                    help="VPU element-op peak (v5e: 8x128 lanes x 4 ALUs "
                    "x ~0.94 GHz ~= 4 Tops/s)")
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=32768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from liso_tpu.models.box_learner import BoxLearner
    from liso_tpu.models.centerpoint import RPN, ConvBNRelu, SepHead
    from liso_tpu.models.pillar_encoder import PillarEncoder, prepare_pillar_inputs
    from liso_tpu.models.slim import SlimModel
    from liso_tpu.ops.bev import BevSetup

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    g, b, n = args.grid, args.batch, args.n
    if not on_tpu:
        g, b, n = 128, 2, 4096
    lo, hi = (4, 16) if on_tpu else (1, 3)

    bev = BevSetup((100.0, 100.0), (g, g))
    dtype = jnp.bfloat16 if on_tpu else None
    slim = SlimModel(bev=bev, num_iters=6, compute_dtype=dtype)
    det = BoxLearner(bev, network="centerpoint", use_baseline_parameters=True,
                     compute_dtype=dtype)

    rng = np.random.RandomState(0)
    pts0 = jnp.asarray(rng.uniform(-45, 45, (b, n, 4)).astype(np.float32))
    pts1 = jnp.asarray(rng.uniform(-45, 45, (b, n, 4)).astype(np.float32))
    valid = jnp.ones((b, n), bool)
    key = jax.random.PRNGKey(0)
    slim_vars = jax.jit(slim.init)(key, pts0, valid, pts1, valid)
    det_vars = jax.jit(det.init)(key, pts0, valid)

    SM = SlimModel

    def encode(p, v):
        return slim.apply(slim_vars, p, v, method=SM.encode_frame)

    fmap0, cn0, _ = jax.jit(encode)(pts0, valid)
    fmap1, cn1, _ = jax.jit(encode)(pts1, valid)

    def mix_pts(out, a):
        s = sum(jnp.sum(x).astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(out))
        return (a[0] + 0.0 * s, *a[1:])

    rows = []

    def stage(name, fn, seed_args):
        ms = chain_slope(fn, seed_args, mix_pts, lo=lo, hi=hi)
        rows.append([name, ms])
        print(f"  {name:<24}{ms:>9.2f} ms", flush=True)
        return ms

    print(f"grid {g} batch {b} n {n} backend {jax.default_backend()}",
          flush=True)

    # --- measured stages -------------------------------------------------
    stage("prep", lambda p, v: prepare_pillar_inputs(p, v, bev),
          (pts0, valid))

    pfn = PillarEncoder(bev, num_channels=64)
    pfn_vars = jax.jit(pfn.init)(key, pts0, valid)
    stage("pfn_scatter",
          lambda p, v: pfn.apply(pfn_vars, p, v)[0], (pts0, valid))

    img0 = jnp.asarray(rng.uniform(-1, 1, (b, g, g, 64)).astype(np.float32))
    if dtype is not None:
        img0 = img0.astype(dtype)

    def raft_encode(x):
        return slim.apply(
            slim_vars, x,
            method=lambda m, xx: m.raft.encode(xx),
        )

    def mix_img(out, a):
        s = sum(jnp.sum(x).astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(out))
        return (a[0] + (0.0 * s).astype(a[0].dtype), *a[1:])

    ms = chain_slope(raft_encode, (img0,), mix_img, lo=lo, hi=hi)
    rows.append(["raft_encode", ms])
    print(f"  {'raft_encode':<24}{ms:>9.2f} ms", flush=True)

    def flow(f0, c0, f1):
        out = slim.apply(slim_vars, f0, c0, f1,
                         method=SM.flow_from_features)
        return out[-1]

    def mix_flow(out, a):
        s = jnp.sum(out).astype(jnp.float32)
        return (a[0] + (0.0 * s).astype(a[0].dtype), *a[1:])

    ms = chain_slope(flow, (fmap0, cn0, fmap1), mix_flow, lo=lo, hi=hi)
    rows.append(["flow_6iter", ms])
    print(f"  {'flow_6iter':<24}{ms:>9.2f} ms", flush=True)

    rpn = RPN(dtype=dtype)
    rpn_vars = jax.jit(rpn.init, static_argnums=2)(key, img0, False)
    ms = chain_slope(lambda x: rpn.apply(rpn_vars, x, False), (img0,),
                     mix_img, lo=lo, hi=hi)
    rows.append(["rpn", ms])
    print(f"  {'rpn':<24}{ms:>9.2f} ms", flush=True)

    import flax.linen as nn

    class _H(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ConvBNRelu(64, 1, dtype=dtype, name="shared")(x, False)
            return SepHead(
                (("pos", 3), ("dims", 3), ("rot", 2), ("probs", 1)),
                dtype=dtype, name="heads")(x, False)

    feat0 = jnp.zeros((b, g // 4, g // 4, 384),
                      img0.dtype if dtype else jnp.float32)
    h = _H()
    h_vars = jax.jit(h.init)(key, feat0)
    ms = chain_slope(lambda x: h.apply(h_vars, x), (feat0,), mix_img,
                     lo=lo, hi=hi)
    rows.append(["shared_heads", ms])
    print(f"  {'shared_heads':<24}{ms:>9.2f} ms", flush=True)

    def full_det(p, v):
        boxes, _, _, _ = det.apply(det_vars, p, v)
        return boxes.pos, boxes.probs

    ms = chain_slope(full_det, (pts0, valid), mix_pts, lo=lo, hi=hi)
    rows.append(["full_detect", ms])
    print(f"  {'full_detect':<24}{ms:>9.2f} ms", flush=True)

    # --- analytical floors ------------------------------------------------
    A = lambda h, c, by=BF2: b * h * h * c * by  # activation bytes at h x h

    floors = {}
    # prep: one HBM round trip of the 6-operand point array (pillarize +
    # sort + scans run VMEM-resident per batch) + VPU comparator work:
    # bitonic sort log2(n)(log2(n)+1)/2 stages over 6 payload columns,
    # segmented scan 2*log2(n) passes fwd+bwd over 4 columns
    k2 = int(np.ceil(np.log2(n)))
    vpu_ops = (
        b * n * 6 * (k2 * (k2 + 1) // 2)  # sort comparator stages
        + b * n * 4 * 2 * k2 * 2  # fwd+bwd segmented scans
    )
    floors["prep"] = np.array(
        [b * n * 12 * F4 * 3, 0.0, 0.0, float(vpu_ops)]
    )

    # PFN linear + pallas scatter (feats read + grid/occ written)
    floors["pfn_scatter"] = (
        np.array([
            b * n * 10 * BF2 + b * n * 64 * BF2,
            2.0 * b * n * _pad128(10) * _pad128(64),
            2.0 * b * n * 10 * 64, 0.0,
        ])
        + np.array([b * n * 65 * BF2 + A(g, 65), 0.0, 0.0, 0.0])
    )

    # JointEncoder (raft.py:129-160): conv1/2 + 2 res blocks per scale
    # (2 convs each, + 1x1 skip on strided) + two 1x1 f32 heads
    e = conv_cost(b, g, 64, 48, k=7, stride=2)
    for _ in range(4):
        e = e + conv_cost(b, g // 2, 48, 48)
    e = e + conv_cost(b, g // 2, 48, 96, stride=2)
    e = e + conv_cost(b, g // 4, 96, 96) + conv_cost(b, g // 2, 48, 96, k=1, stride=2)
    e = e + 2 * conv_cost(b, g // 4, 96, 96)
    e = e + conv_cost(b, g // 4, 96, 144, stride=2)
    e = e + conv_cost(b, g // 8, 144, 144) + conv_cost(b, g // 4, 96, 144, k=1, stride=2)
    e = e + 2 * conv_cost(b, g // 8, 144, 144)
    e = e + conv_cost(b, g // 8, 144, 128, k=1, out_bytes=F4)
    e = e + conv_cost(b, g // 8, 144, 160, k=1, out_bytes=F4)
    floors["raft_encode"] = e

    # flow: fused corr kernel (measured blocks: ~27 MB/lookup per
    # STATUS.md) + 6x update block at g/8 + final convex upsample
    h8 = g // 8
    p_total = sum((h8 // 2 ** lv) ** 2 for lv in range(4))
    corr_fl = 2.0 * b * h8 * h8 * p_total * 128 * 6
    corr = np.array([6 * 27e6 * (g / 512) ** 2 * (b / 8),
                     corr_fl, corr_fl, 0.0])  # kernel dims are 128-padded
    u = np.zeros(4)
    taps = 4 * 49  # corr_levels * (2r+1)^2
    u = u + conv_cost(b, h8, taps, 96, k=1)          # conv_stat_corr1
    u = u + conv_cost(b, h8, 2, 64, k=7) + conv_cost(b, h8, 64, 32)
    u = u + conv_cost(b, h8, 96 + 32, 80)            # motion conv
    u = u + conv_cost(b, h8, 80 + 64 + 96, 96 * 2, k=3)  # gru zr (in=mot+ctx+net)
    u = u + conv_cost(b, h8, 80 + 64 + 96, 96, k=3)  # gru q
    u = u + conv_cost(b, h8, 96, 128) + conv_cost(b, h8, 128, 4, out_bytes=F4)
    u = u + conv_cost(b, h8, 96, 256) + conv_cost(b, h8, 256, 2, out_bytes=F4)
    ups = np.array([A(h8, 256) + A(h8, 576, F4) + A(g, 9, F4), 0.0, 0.0, 0.0])
    floors["flow_6iter"] = corr + 6 * u + ups

    # RPN (centerpoint.py:80-113), baseline: stages (3,5,5) @ strides 2
    r = conv_cost(b, g, 64, 64, stride=2)
    for _ in range(3):
        r = r + conv_cost(b, g // 2, 64, 64)
    r = r + conv_cost(b, g // 2, 64, 128, stride=2)
    for _ in range(5):
        r = r + conv_cost(b, g // 4, 128, 128)
    r = r + conv_cost(b, g // 4, 128, 256, stride=2)
    for _ in range(5):
        r = r + conv_cost(b, g // 8, 256, 256)
    r = r + conv_cost(b, g // 2, 64, 128, k=2, stride=2)   # up0 (0.5x)
    r = r + conv_cost(b, g // 4, 128, 128, k=1)            # up1
    r = r + conv_cost(b, g // 8, 256, 128, k=2)            # up2 deconv
    floors["rpn"] = r

    hh = g // 4
    s = conv_cost(b, hh, 384, 64, k=1)
    s = s + conv_cost(b, hh, 64, 256)
    for oc in (3, 3, 2, 1):
        s = s + conv_cost(b, hh, 64, oc, out_bytes=F4)
    floors["shared_heads"] = s

    floors["full_detect"] = (
        floors["pfn_scatter"] + floors["rpn"] + floors["shared_heads"]
    )

    # --- report -----------------------------------------------------------
    peak_bw = args.peak_gbs * 1e9
    peak_tf = args.peak_tf * 1e12
    peak_vpu = args.vpu_tops * 1e12

    def floor_ms_of(fl):
        bw_ms = fl[0] / peak_bw * 1e3
        cq_ms = fl[1] / peak_tf * 1e3
        vp_ms = fl[3] / peak_vpu * 1e3
        return max(bw_ms, cq_ms, vp_ms), bw_ms, cq_ms, vp_ms

    out_rows = []
    print(f"\n{'stage':<24}{'meas ms':>9}{'floor ms':>10}{'x floor':>9}"
          f"{'bound':>8}")
    for name, ms in rows:
        fl = floors.get(name)
        if fl is None:
            continue
        floor_ms, bw_ms, cq_ms, vp_ms = floor_ms_of(fl)
        ci_ms = fl[2] / peak_tf * 1e3
        bound = {bw_ms: "hbm", cq_ms: "mxu", vp_ms: "vpu"}[
            max(bw_ms, cq_ms, vp_ms)
        ]
        ratio = ms / floor_ms if floor_ms > 0 else float("inf")
        print(f"{name:<24}{ms:>9.2f}{floor_ms:>10.2f}{ratio:>9.2f}{bound:>8}")
        out_rows.append({
            "stage": name, "measured_ms": round(ms, 2),
            "floor_ms": round(floor_ms, 2),
            "floor_bw_ms": round(bw_ms, 2),
            "floor_mxu_ms": round(cq_ms, 2),
            "floor_mxu_ideal_ms": round(ci_ms, 2),
            "floor_vpu_ms": round(vp_ms, 2),
            "x_floor": round(ratio, 2), "bound": bound,
        })

    # fused-step totals: pfn_scatter runs twice (SLIM + detector)
    total_meas = sum(ms for nm, ms in rows if nm in (
        "prep", "pfn_scatter", "raft_encode", "flow_6iter", "rpn",
        "shared_heads")) + dict(rows)["pfn_scatter"]
    total_floor = sum(
        floor_ms_of(floors[nm])[0]
        for nm in ("prep", "pfn_scatter", "raft_encode", "flow_6iter",
                   "rpn", "shared_heads")
    ) + floor_ms_of(floors["pfn_scatter"])[0]
    result = {
        "metric": "roofline_fused_step",
        "grid": g, "batch": b, "n_pts": n,
        "peak_tf_s": args.peak_tf, "peak_gb_s": args.peak_gbs,
        "vpu_tops": args.vpu_tops,
        "floor_model": "mxu-tile-quantized (see module docstring)",
        "stages": out_rows,
        "stage_sum_measured_ms": round(total_meas, 2),
        "stage_sum_floor_ms": round(total_floor, 2),
        "x_floor_overall": round(total_meas / total_floor, 2)
        if total_floor else None,
    }
    print(json.dumps(result))
    art = Path("docs/artifacts")
    if art.is_dir() and on_tpu:
        with open(art / "roofline_r5.json", "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
