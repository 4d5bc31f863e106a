"""Timing of the banded kNN kernel at SLIM train-step scale.

The SLIM loss runs nn_1_sorted_diff 36x per step (3 flow types x 2
directions x 6 RAFT iterations) at ~32k x 32k per direction. This bench
times ONE call (chained, dispatch amortized) and reports the implied
per-step kNN cost.

Usage: python benchmarks/knn_bench.py [--n 32768] [--batch 2] [--iters 20]
       [--margin 8.0]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--margin", type=float, default=8.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from liso_tpu.ops.knn_pallas import nn_1_sorted

    rng = np.random.RandomState(0)
    b, n = args.batch, args.n

    def cloud():
        pts = rng.uniform(-50, 50, (b, n, 3)).astype(np.float32)
        # cell-sorted order (x-major) with ~70% valid tail-padded
        order = np.argsort(pts[..., 0], axis=-1)
        pts = np.take_along_axis(pts, order[..., None], axis=1)
        valid = np.zeros((b, n), bool)
        valid[:, : int(0.7 * n)] = True
        pts = np.where(valid[..., None], pts, pts.max())
        return jnp.asarray(pts), jnp.asarray(valid)

    q, qv = cloud()
    r, rv = cloud()

    @jax.jit
    def run(q):
        def body(_, carry):
            x, acc = carry
            d, _ = nn_1_sorted(x + 0.0 * acc, r, qv, rv, args.margin)
            return x, acc + 1e-12 * d.sum()

        _, acc = jax.lax.fori_loop(
            0, args.iters, body, (q, jnp.zeros(()))
        )
        return acc

    jax.block_until_ready(run(q))
    t0 = time.perf_counter()
    jax.block_until_ready(run(q))
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(
        f"nn_1_sorted {b}x{n} margin {args.margin}: {ms:.2f} ms/call "
        f"-> {36 * ms:.0f} ms per SLIM step (36 calls)"
    )


if __name__ == "__main__":
    main()
