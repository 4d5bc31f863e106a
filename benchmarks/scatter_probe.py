"""One-off probe: grid scatter-max cost structure on this chip.

Times grid_reduce at C=65 vs C=128 (lane padding: both pad to 128 lanes,
so a fused two-encoder scatter at C=128 should cost ~= one C=65 call),
add vs max (the within-chunk segmented scan-max is the delta), and a
tile sweep via LISO_GRID_TILE.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/scatter_probe.py
"""
from __future__ import annotations

import numpy as np

from benchmarks._timing import chain_slope


def main():
    import jax
    import jax.numpy as jnp

    from liso_tpu.ops.grid_scatter_pallas import grid_reduce

    b, n, g = 8, 32768, 512
    nc = g * g
    rng = np.random.RandomState(0)
    cells = np.sort(rng.randint(0, nc, (b, n)).astype(np.int32), axis=1)
    cells = jnp.asarray(cells)

    def mix(gr, a):
        return (a[0] * 0.999 + gr[:, :n, :].astype(a[0].dtype) * 1e-6,
                *a[1:])

    for c in (65, 128):
        x = jnp.asarray(
            rng.uniform(0, 1, (b, n, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for op in ("max", "add"):
            ms = chain_slope(
                lambda xx, cc, op=op: grid_reduce(xx, cc, nc, op, False,
                                                  False),
                (x, cells), mix,
            )
            print(f"C={c:<4} op={op:<4} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
