"""On-chip accuracy artifact for the fused corr-recompute kernel.

Runs the three correlation-lookup implementations (fused Pallas kernel,
materialized bf16 volume + one-hot MXU matmuls, jnp gather) on the REAL
backend at bench.py scale and reports their pairwise agreement — the
per-round recorded evidence that the perf kernel is still exact on
hardware (round-1 shipped a silently-wrong on-chip kNN kernel; every
Pallas kernel now gets an on-chip accuracy artifact per round).

Expected: fused level-0 taps BIT-EXACT vs the mm path on
bf16-representable fmaps; pooled levels within one bf16 ulp of the corr
magnitude (the fused path quantizes pooled f1 before the matmul, the mm
path quantizes the f32 corr after it — see ops/corr_fused_pallas.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/corr_accuracy_tpu.py
"""
from __future__ import annotations

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from liso_tpu.models.raft import build_corr_pyramid
    from liso_tpu.ops.corr_fused_pallas import (
        corr_window_features,
        pool_f1_levels,
    )
    from liso_tpu.ops.corr_lookup_mm import (
        lookup_prepared_mm,
        prepare_corr_volumes_mm,
    )

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    # bench.py scale on TPU (512 grid -> 64x64 at /8), smoke scale on CPU
    b, h, w, c = (8, 64, 64, 64) if on_tpu else (2, 16, 16, 32)
    levels = 4

    rng = np.random.RandomState(0)
    # bf16-representable fmaps (what the mixed-precision encoder emits)
    f0 = (
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        .astype(jnp.bfloat16)
        .astype(jnp.float32)
    )
    f1 = (
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        .astype(jnp.bfloat16)
        .astype(jnp.float32)
    )
    # coords spanning in-bounds, fractional, and out-of-bounds (zero pad)
    coords = jnp.asarray(
        rng.uniform(-6, h + 6, (b, h, w, 2)).astype(np.float32)
    )

    @jax.jit
    def run_fused(f0, f1, coords):
        f1cat, lvls = pool_f1_levels(f1, levels)
        return corr_window_features(
            f0.reshape(b, h * w, c), f1cat, coords, lvls
        )

    @jax.jit
    def run_mm(f0, f1, coords):
        pyramid = build_corr_pyramid(f0, f1, levels)
        return lookup_prepared_mm(prepare_corr_volumes_mm(pyramid), coords)

    out_f = np.asarray(jax.block_until_ready(run_fused(f0, f1, coords)))
    out_m = np.asarray(jax.block_until_ready(run_mm(f0, f1, coords)))

    per_level = {}
    exact0 = None
    for lv in range(levels):
        a = out_f[..., lv * 49 : (lv + 1) * 49]
        r = out_m[..., lv * 49 : (lv + 1) * 49]
        diff = np.abs(a - r)
        per_level[f"level{lv}_max_abs"] = float(diff.max())
        per_level[f"level{lv}_frac_exact"] = float((diff == 0).mean())
        if lv == 0:
            exact0 = bool((a == r).all())

    scale = float(np.abs(out_m).max())
    print(
        json.dumps(
            {
                "metric": "corr_fused_vs_mm_onchip",
                "level0_bit_exact": exact0,
                "corr_magnitude": round(scale, 3),
                **{k: round(v, 8) for k, v in per_level.items()},
                "backend": jax.devices()[0].platform,
                "shape": [b, h, w, c],
            }
        )
    )
    # level 0: no pooling -> both paths compute the same bf16-representable
    # products (bit-exact on TPU; CPU interpret mode only differs by f32
    # accumulation order). pooled levels carry one extra bf16 rounding of
    # pooled-f1 (~2^-8 relative).
    assert per_level["level0_max_abs"] <= 1e-5 * max(scale, 1.0), per_level
    tol = 2 ** -7 * max(scale, 1.0)
    for lv in range(1, levels):
        assert per_level[f"level{lv}_max_abs"] <= tol, (lv, per_level, tol)
    print("OK")


if __name__ == "__main__":
    main()
