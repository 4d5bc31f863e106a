"""On-chip accuracy check of the banded kNN kernel vs scipy cKDTree.

Realistic conditions: cell-sorted clouds, ~60% valid with the invalid tail
padded (several trailing all-invalid ref tiles — the ADVICE r1 regression
surface), margin 8 m. Prints the fraction of queries whose in-margin true
NN the kernel reproduces (the README accuracy claim).

Usage: python benchmarks/knn_accuracy_tpu.py [--n 32768] [--batch 2]
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--margin", type=float, default=8.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from liso_tpu.ops.knn_pallas import nn_1_sorted

    # CPU smoke: interpret mode (device platform, not backend name — the
    # axon plugin registers platform "tpu" under backend name "axon")
    interpret = not any(d.platform == "tpu" for d in jax.devices())

    b, n = args.batch, args.n

    def cloud(seed):
        r = np.random.RandomState(seed)
        pts = r.uniform(-50, 50, (b, n, 3)).astype(np.float32)
        pts[..., 2] = r.uniform(-2, 2, (b, n))
        order = np.argsort(pts[..., 0], axis=-1)
        pts = np.take_along_axis(pts, order[..., None], axis=1)
        valid = np.zeros((b, n), bool)
        valid[:, : int(0.6 * n)] = True
        # invalid tail mimics the drop-bucket sort: coords pinned high
        pts = np.where(valid[..., None], pts, 1e3)
        return pts, valid

    q, qv = cloud(1)
    r, rv = cloud(2)
    d, idx = nn_1_sorted(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(qv), jnp.asarray(rv),
        args.margin, interpret=interpret,
    )
    d = np.asarray(d)
    idx = np.asarray(idx)

    total = matched = 0
    for i in range(b):
        tree = cKDTree(r[i][rv[i]])
        ref_idx = np.flatnonzero(rv[i])
        dd, ii = tree.query(q[i][qv[i]])
        got_d = d[i][qv[i]]
        got_i = idx[i][qv[i]]
        true_i = ref_idx[ii]
        sel = dd <= args.margin  # contract: exact within the band margin
        total += sel.sum()
        ok = (got_i[sel] == true_i[sel]) | np.isclose(
            np.sqrt(got_d[sel]), dd[sel], atol=1e-3
        )
        matched += ok.sum()
    print(
        f"kernel vs scipy ({b}x{n}, margin {args.margin}): "
        f"{matched}/{total} in-margin queries match "
        f"({100.0 * matched / max(total, 1):.3f}%)"
    )


if __name__ == "__main__":
    main()
