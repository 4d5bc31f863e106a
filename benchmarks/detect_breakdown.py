"""Stage-level timing of the CenterPoint detect path on the current
backend (the detect share of bench.py's fused step).

Times, each as n chained iterations inside one jit (tunnel-safe, like
bench.py): pillar encoder alone, RPN backbone alone, shared conv + heads
alone, full detect forward. Run on TPU to find the next bandwidth wall.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/detect_breakdown.py
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def _chain(fn, seed_args, iters, mix):
    """Build f(args) that runs fn `iters` times with a serialising data
    dependency injected through `mix(out, args) -> args`."""
    import jax

    @jax.jit
    def run(*args):
        def body(_, a):
            return mix(fn(*a), a)

        return jax.lax.fori_loop(0, iters, body, args)

    jax.block_until_ready(run(*seed_args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(*seed_args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from liso_tpu.models.box_learner import BoxLearner
    from liso_tpu.models.centerpoint import RPN, ConvBNRelu, SepHead
    from liso_tpu.models.pillar_encoder import PillarEncoder
    from liso_tpu.ops.bev import BevSetup

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else None
    g, b, n, iters = args.grid, args.batch, args.n, args.iters
    bev = BevSetup((100.0, 100.0), (g, g))

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-45, 45, (b, n, 4)).astype(np.float32))
    valid = jnp.ones((b, n), bool)
    key = jax.random.PRNGKey(0)

    # --- full detect forward (the bench.py component)
    det = BoxLearner(bev, network="centerpoint",
                     use_baseline_parameters=True, compute_dtype=dtype)
    det_vars = jax.jit(det.init)(key, pts, valid)

    def full(p, v):
        boxes, _, _, _ = det.apply(det_vars, p, v)
        return boxes.pos, boxes.probs

    dt_full = _chain(
        full, (pts, valid), iters,
        lambda out, a: (a[0] + 0.0 * (out[0].sum() + out[1].sum()), a[1]),
    )
    print(f"full detect fwd: {dt_full * 1e3:8.2f} ms", flush=True)

    # --- pillar encoder alone
    pfn = PillarEncoder(bev, num_channels=64)
    pfn_vars = jax.jit(pfn.init)(key, pts, valid)

    def pillars(p, v):
        img, occ = pfn.apply(pfn_vars, p, v)
        return img

    dt_pfn = _chain(
        pillars, (pts, valid), iters,
        lambda img, a: (a[0] + 0.0 * img.sum(), a[1]),
    )
    print(f"pillar encoder:  {dt_pfn * 1e3:8.2f} ms", flush=True)

    # --- RPN alone on a fixed pseudo-image
    img0 = jnp.asarray(
        rng.uniform(-1, 1, (b, g, g, 64)).astype(np.float32)
    )
    if dtype is not None:
        img0 = img0.astype(dtype)
    rpn = RPN(dtype=dtype)
    rpn_vars = jax.jit(rpn.init, static_argnums=2)(key, img0, False)

    def rpn_fwd(x):
        return rpn.apply(rpn_vars, x, False)

    dt_rpn = _chain(
        rpn_fwd, (img0,), iters,
        lambda out, a: (a[0] + 0.0 * out.sum().astype(a[0].dtype),),
    )
    print(f"rpn backbone:    {dt_rpn * 1e3:8.2f} ms", flush=True)

    # --- shared conv + heads on the RPN output shape
    feat0 = jnp.zeros(rpn_fwd(img0).shape, img0.dtype)

    import flax.linen as nn

    class _H(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ConvBNRelu(64, 1, dtype=dtype, name="shared")(x, False)
            maps = SepHead(
                (("pos", 3), ("dims", 3), ("rot", 2), ("probs", 1)),
                dtype=dtype, name="heads",
            )(x, False)
            return sum(m.sum() for m in maps.values())

    h = _H()
    h_vars = jax.jit(h.init)(key, feat0)

    def heads_fwd(x):
        return h.apply(h_vars, x)

    dt_heads = _chain(
        heads_fwd, (feat0,), iters,
        lambda out, a: (a[0] + 0.0 * out.astype(a[0].dtype),),
    )
    print(f"shared+heads:    {dt_heads * 1e3:8.2f} ms", flush=True)
    print(
        f"(decode/other = full - parts: "
        f"{(dt_full - dt_pfn - dt_rpn - dt_heads) * 1e3:.2f} ms)"
    )


if __name__ == "__main__":
    main()
