"""Stage-level timing of the PillarEncoder (the detect path's biggest
chunk per benchmarks/detect_breakdown.py at batch 8 / 512 grid).

Uses the slope method from benchmarks/_timing.py (the tunnel's
block_until_ready can return early; naive chains lie).

Stages:
  pillarize     cell-id assignment (vmapped point_cell_ids)
  sort          multi-operand lax.sort by cell id (keys + f+1 payloads)
  seg_totals    sorted segmented scans for per-point cluster means
  dense_bn      Dense(64) + masked BN + relu on assembled features
  grid_max      pallas one-hot scatter-max into the 512^2 grid (65 bf16 ch)
  prep          prepare_pillar_inputs (pillarize+sort+means+assembly)
  full          PillarEncoder.apply end to end

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pillar_breakdown.py
"""
from __future__ import annotations

import argparse

import numpy as np

from benchmarks._timing import chain_slope


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--stages", type=str, default="all",
                    help="comma list: full,prep,pillarize,sort,seg,dense,gridmax")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from liso_tpu.models.pillar_encoder import (
        PillarEncoder, prepare_pillar_inputs,
    )
    from liso_tpu.ops import scatter
    from liso_tpu.ops.bev import BevSetup
    from liso_tpu.ops.pillars import pillarize

    g, b, n = args.grid, args.batch, args.n
    stages = set(args.stages.split(","))
    want = lambda k: "all" in stages or k in stages
    bev = BevSetup((100.0, 100.0), (g, g))
    nc = bev.num_cells

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-45, 45, (b, n, 4)).astype(np.float32))
    valid = jnp.ones((b, n), bool)
    key = jax.random.PRNGKey(0)

    # --- full encoder
    if want("full"):
        pfn = PillarEncoder(bev, num_channels=64)
        pfn_vars = jax.jit(pfn.init)(key, pts, valid)
        dt = chain_slope(
            lambda p, v: pfn.apply(pfn_vars, p, v)[0],
            (pts, valid),
            lambda img, a: (
                a[0] * 0.999 + img[:, :1, 0, :4].astype(a[0].dtype) * 1e-6,
                a[1],
            ),
        )
        print(f"full encoder:  {dt:8.2f} ms", flush=True)

    # --- prepare_pillar_inputs (the shareable prefix)
    if want("prep"):
        dt = chain_slope(
            lambda p, v: prepare_pillar_inputs(p, v, bev),
            (pts, valid),
            lambda out, a: (a[0] * 0.999 + out[0][..., :4] * 1e-6, a[1]),
        )
        print(f"prep (shared): {dt:8.2f} ms", flush=True)

    # --- pillarize (cell ids)
    if want("pillarize"):
        dt = chain_slope(
            lambda p, v: jax.vmap(
                lambda pp, vv: pillarize(pp, vv, bev)
            )(p, v)[0],
            (pts, valid),
            lambda cid, a: (
                a[0] * 0.999 + cid[..., None].astype(a[0].dtype) * 1e-9, a[1],
            ),
        )
        print(f"pillarize:     {dt:8.2f} ms", flush=True)

    # --- sort
    cid0, inp0 = jax.vmap(lambda pp, vv: pillarize(pp, vv, bev))(pts, valid)

    def do_sort(p, cid, inp):
        f = p.shape[-1]
        ops = jax.lax.sort(
            [cid] + [p[..., i] for i in range(f)]
            + [inp.astype(jnp.float32)],
            dimension=-1, num_keys=1,
        )
        return ops[0], jnp.stack(ops[1:1 + f], axis=-1)

    if want("sort"):
        dt = chain_slope(
            do_sort, (pts, cid0, inp0),
            lambda out, a: (a[0] * 0.999 + out[1] * 1e-6, a[1], a[2]),
        )
        print(f"sort:          {dt:8.2f} ms", flush=True)

    cell_s, pts_s = jax.jit(do_sort)(pts, cid0, inp0)

    # --- segmented totals (cluster means)
    def seg(p, c):
        xyz1 = jnp.concatenate([p[..., :3], jnp.ones_like(p[..., :1])], -1)
        t = scatter.sorted_segment_totals(xyz1, c)
        return t[..., :3] / jnp.maximum(t[..., 3:], 1e-8)

    if want("seg"):
        dt = chain_slope(
            seg, (pts_s, cell_s),
            lambda m, a: (a[0].at[..., :3].add(m * 1e-6), a[1]),
        )
        print(f"seg_totals:    {dt:8.2f} ms", flush=True)

    # --- dense + BN + relu on assembled features
    feats0 = jnp.concatenate(
        [pts_s, pts_s[..., :3], pts_s[..., :2]], axis=-1
    )
    import flax.linen as nn

    class _D(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(64, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3)(x)
            return nn.relu(x)

    if want("dense"):
        dmod = _D()
        dvars = jax.jit(dmod.init)(key, feats0)
        dt = chain_slope(
            lambda f: dmod.apply(dvars, f), (feats0,),
            lambda y, a: (a[0] * 0.999 + y[..., :9] * 1e-6,),
        )
        print(f"dense_bn:      {dt:8.2f} ms", flush=True)

    # --- grid max scatter (TPU only: the pallas kernel has no CPU path)
    from liso_tpu.ops.grid_scatter_pallas import (
        grid_reduce, use_pallas_grid_ops,
    )

    if not use_pallas_grid_ops():
        print("grid_max:      (skipped off-TPU)")
        return
    if want("gridmax"):
        x0 = jnp.asarray(
            rng.uniform(0, 1, (b, n, 65)).astype(np.float32)
        ).astype(jnp.bfloat16)

        dt = chain_slope(
            lambda x, c: grid_reduce(x, c, nc, "max", False, False),
            (x0, cell_s),
            lambda gr, a: (a[0] * 0.999 + gr[:, :n, :] * 1e-6, a[1]),
        )
        print(f"grid_max:      {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
