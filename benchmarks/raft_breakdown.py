"""Per-stage timing of the SLIM flow pass at bench scale.

Times, each as its own chained jit (dispatch overhead amortized over
--iters inner repetitions with a serializing data dependency):

  encode       JointEncoder on one frame
  pyramid      build_corr_pyramid (+ bf16 cast)
  lookup       one corr window lookup (TPU mm path)
  update       one SmallUpdateBlock step (motion encoder + GRU + heads)
  upsample     x8 bilinear upsample of flow+logits to full res
  flow_pass    the whole flow_from_features (6 iters)

Usage: python benchmarks/raft_breakdown.py [--grid 512] [--batch 8] [--iters 20]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, *args, iters):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from liso_tpu.models.raft import (
        RAFT, build_corr_pyramid, make_corr_lookup, upsample_bilinear,
    )

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else None
    g, b, iters = args.grid, args.batch, args.iters
    gc = g // 8  # coarse grid

    raft = RAFT(
        num_iters=6,
        predict_weight_for_static_aggregation="sigmoid" and True,
        dtype=dtype,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, g, g, 65).astype(np.float32))
    params = jax.jit(raft.init)(jax.random.PRNGKey(0), img, img)

    def chain(fn, x0):
        """Run fn iters times with a serializing scalar dependency."""

        @jax.jit
        def run(x):
            def body(_, carry):
                x, acc = carry
                y = fn(x + 0.0 * acc)
                leaf = jax.tree.leaves(y)[0]
                return x, acc + 1e-12 * leaf.astype(jnp.float32).sum()

            _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.zeros(())))
            return acc

        return run, x0

    print(f"grid {g}, batch {b}, backend {jax.default_backend()}", flush=True)

    class rows:  # print each stage as it lands (TPU-tunnel runs are slow)
        @staticmethod
        def append(item):
            name, ms = item
            print(f"  {name:<28}{ms:>9.2f} ms", flush=True)

    # --- encode
    enc_fn, enc_x = chain(
        lambda x: raft.apply(params, x, method=RAFT.encode), img
    )
    rows.append(("encode (joint fnet+cnet)", timeit(enc_fn, enc_x, iters=iters)))

    fmap0, cn0 = raft.apply(params, img, method=RAFT.encode)
    fmap1, _ = raft.apply(params, img + 0.01, method=RAFT.encode)
    fmap0, fmap1 = jax.block_until_ready((fmap0, fmap1))

    # --- pyramid build
    pyr_fn, _ = chain(lambda f: build_corr_pyramid(f, fmap1), fmap0)
    rows.append(("corr pyramid build", timeit(pyr_fn, fmap0, iters=iters)))

    pyramid = build_corr_pyramid(fmap0, fmap1)
    coords = jnp.asarray(
        rng.uniform(0, gc, (b, gc, gc, 2)).astype(np.float32)
    )

    # --- one lookup (prepared once, like the real loop); pyramid passed as
    # an argument, NOT a closure constant (constants upload with the HLO)
    @jax.jit
    def lk_run(pyr, coords):
        lookup = make_corr_lookup(pyr)

        def body(_, carry):
            c, acc = carry
            out = lookup(c + 0.0 * acc)
            return c, acc + 1e-12 * out.sum()

        _, acc = jax.lax.fori_loop(0, iters, body, (coords, jnp.zeros(())))
        return acc

    import os

    if os.environ.get("LISO_CORR_PATH", "fused") != "fused" or not on_tpu:
        rows.append(
            ("corr lookup (1 iter)",
             timeit(lk_run, pyramid, coords, iters=iters))
        )

    # --- fused recompute lookup (pallas): pool+prepare once, lookup per iter
    from liso_tpu.ops.corr_fused_pallas import (
        corr_window_features, pool_f1_levels,
    )

    f1cat, lvls = pool_f1_levels(fmap1, 4)
    f0_flat = fmap0.reshape(b, gc * gc, -1)

    @jax.jit
    def fused_run(f0f, f1c, coords):
        def body(_, carry):
            c, acc = carry
            out = corr_window_features(f0f, f1c, c + 0.0 * acc, lvls)
            return c, acc + 1e-12 * out.sum()

        _, acc = jax.lax.fori_loop(0, iters, body, (coords, jnp.zeros(())))
        return acc

    if on_tpu:
        rows.append(
            ("fused corr lookup (1 iter)",
             timeit(fused_run, f0_flat, f1cat, coords, iters=iters))
        )

    # --- one update-block step
    net = jnp.tanh(cn0[..., :96])
    inp = jax.nn.relu(cn0[..., 96:])
    corr = make_corr_lookup(pyramid)(coords)
    flow = jnp.zeros((b, gc, gc, 2))
    logits = jnp.zeros((b, gc, gc, 4))
    wlog = jnp.zeros((b, gc, gc, 1))
    corr = jax.block_until_ready(corr)

    @jax.jit
    def up_run(net):
        def body(_, carry):
            n, acc = carry
            n2, df, dl, dw = raft.apply(
                params, n, inp, corr, flow, logits, wlog,
                method=lambda m, *a: m.update_block(*a),
            )
            return n2, acc + 1e-12 * df.sum()

        _, acc = jax.lax.fori_loop(0, iters, body, (net, jnp.zeros(())))
        return acc

    rows.append(("update block (1 iter)", timeit(up_run, net, iters=iters)))

    # --- upsample of one iteration's outputs
    small = jnp.zeros((b, gc, gc, 7))

    @jax.jit
    def us_run(x):
        def body(_, carry):
            s, acc = carry
            u = upsample_bilinear(s + 0.0 * acc, 8)
            return s, acc + 1e-12 * u.sum()

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.zeros(())))
        return acc

    rows.append(("x8 upsample (1 tensor)", timeit(us_run, small, iters=iters)))

    # --- whole flow pass
    fp_fn, _ = chain(
        lambda f: raft.apply(
            params, f, cn0, fmap1, method=RAFT.flow_from_features
        ),
        fmap0,
    )
    rows.append(("flow pass (6 iters, train)", timeit(fp_fn, fmap0, iters=iters)))

    fp2_fn, _ = chain(
        lambda f: raft.apply(
            params, f, cn0, fmap1, upsample_all=False,
            method=RAFT.flow_from_features,
        ),
        fmap0,
    )
    rows.append(("flow pass (final-only ups)", timeit(fp2_fn, fmap0, iters=iters)))



if __name__ == "__main__":
    main()
