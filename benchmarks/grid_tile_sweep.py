"""Time the grid-scatter kernels at one cell-tile size (LISO_GRID_TILE).

One tile per process (the impl jit caches the tile at first trace); uses
the slope method (benchmarks/_timing.chain_slope) because the tunnel's
block_until_ready can return early.

Usage:
  for t in 512 1024 2048 4096; do
    LISO_GRID_TILE=$t PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/grid_tile_sweep.py; done
"""
from __future__ import annotations

import os

import numpy as np

from benchmarks._timing import chain_slope


def main():
    import jax
    import jax.numpy as jnp

    from liso_tpu.ops.grid_scatter_pallas import grid_gather, grid_reduce

    b, n, g = 8, 32768, 512
    nc = g * g
    rng = np.random.RandomState(0)
    cells = np.sort(rng.randint(0, nc, (b, n)).astype(np.int32), axis=1)
    cells = jnp.asarray(cells)
    x65 = jnp.asarray(
        rng.uniform(0, 1, (b, n, 65)).astype(np.float32)
    ).astype(jnp.bfloat16)
    xyz1 = jnp.asarray(rng.uniform(-50, 50, (b, n, 4)).astype(np.float32))
    grid4 = jnp.asarray(rng.uniform(-50, 50, (b, nc, 4)).astype(np.float32))

    tile = os.environ.get("LISO_GRID_TILE", "4096")

    dt_max = chain_slope(
        lambda x, c: grid_reduce(x, c, nc, "max", False, False),
        (x65, cells),
        lambda gr, a: (a[0] * 0.999 + gr[:, :n, :] * 1e-6, a[1]),
    )
    dt_add = chain_slope(
        lambda x, c: grid_reduce(x, c, nc, "add", False, True),
        (xyz1, cells),
        lambda gr, a: (a[0] * 0.999 + gr[:, :n, :] * 1e-6, a[1]),
    )
    dt_gat = chain_slope(
        lambda gr, c: grid_gather(gr, c, False, True),
        (grid4, cells),
        lambda o, a: (a[0].at[:, :n, :].add(o * 1e-6), a[1]),
    )
    print(
        f"tile {tile:>5}: max65 {dt_max:7.2f} ms   add4 {dt_add:7.2f} ms"
        f"   gather4 {dt_gat:7.2f} ms", flush=True,
    )


if __name__ == "__main__":
    main()
