"""On-device clustering for the flow-cluster bootstrap detector.

The reference clusters dynamic BEV cells with sklearn DBSCAN on
(xy, 2*flow) features — a GPU->CPU round trip per frame
(liso/networks/flow_cluster_detector/flow_cluster_detector.py:162-168,
eps=1.0 m, min_samples=5). On TPU we use iterative min-label propagation
(connected components) over the thresholded dynamicness grid instead: the
mask is dilated a configurable number of 3x3 steps to reproduce DBSCAN's
eps-ball connectivity (eps 1 m / 0.2 m cells ~ radius 5 -> 2 dilations
bridge most gaps), labels only live on original mask cells, and a bounded
lax.while_loop propagates min labels until fixpoint. Per-label statistics
(centroid / orientation / axis lengths a la skimage regionprops) come from
segment reductions over second moments.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _dilate(mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """3x3 binary dilation via max-pool, `iterations` times."""
    m = mask.astype(jnp.float32)[None, ..., None]
    for _ in range(iterations):
        m = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
        )
    return m[0, ..., 0] > 0.5


@partial(jax.jit, static_argnames=("dilation", "max_iters"))
def connected_components(
    mask: jnp.ndarray, dilation: int = 2, max_iters: int = 256
) -> jnp.ndarray:
    """[H, W] bool -> int32 labels [H, W]; 0 = background, clusters get the
    (arbitrary but consistent) min flat-index + 1 of their member cells.
    Connectivity is 8-neighborhood through the dilated mask; labels are
    reported only on original mask cells."""
    h, w = mask.shape
    grown = _dilate(mask, dilation) if dilation > 0 else mask
    init = jnp.where(
        grown, jnp.arange(h * w, dtype=jnp.int32).reshape(h, w), jnp.int32(h * w)
    )

    def propagate(labels):
        p = jnp.pad(labels, 1, constant_values=h * w)
        neigh = jnp.stack(
            [
                p[dr : dr + h, dc : dc + w]
                for dr in range(3)
                for dc in range(3)
            ]
        )
        best = jnp.min(neigh, axis=0)
        return jnp.where(grown, jnp.minimum(labels, best), labels)

    def cond(state):
        labels, prev, it = state
        return (it < max_iters) & jnp.any(labels != prev)

    def body(state):
        labels, _, it = state
        return propagate(labels), labels, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (propagate(init), init, jnp.int32(0))
    )
    return jnp.where(mask, labels + 1, 0)


class ClusterStats(NamedTuple):
    centroid_rc: jnp.ndarray  # [K, 2] float cell coords
    orientation: jnp.ndarray  # [K] major-axis angle vs row axis (radians)
    axis_major: jnp.ndarray  # [K] cells (regionprops axis_major_length)
    axis_minor: jnp.ndarray  # [K]
    count: jnp.ndarray  # [K] int
    valid: jnp.ndarray  # [K] bool


@partial(jax.jit, static_argnames=("k_max",))
def cluster_stats(labels: jnp.ndarray, k_max: int = 64) -> ClusterStats:
    """Top-k_max clusters by size with regionprops-style moments
    (skimage.measure.regionprops centroid/orientation/axis_*_length
    semantics, used at flow_cluster_detector.py:173-200)."""
    h, w = labels.shape
    flat = labels.reshape(-1)
    present = flat > 0
    # compact labels to dense ids: clusters carry min-flat-index+1 labels;
    # rank them by size via a segment count over the raw label space is too
    # large, so hash labels into k slots by sorting unique label values.
    # Cheap trick: count members per raw label using a sort.
    order = jnp.argsort(jnp.where(present, flat, jnp.int32(h * w + 1)))
    sorted_lab = flat[order]
    is_start = jnp.concatenate(
        [jnp.array([True]), sorted_lab[1:] != sorted_lab[:-1]]
    ) & (sorted_lab <= h * w)
    # positions of starts, capped at k_max clusters (first-come = smallest
    # label value; fine since we filter by stats afterwards)
    start_idx = jnp.nonzero(is_start, size=k_max, fill_value=h * w)[0]
    cluster_label = jnp.where(
        start_idx < h * w, sorted_lab[jnp.clip(start_idx, 0, h * w - 1)], -1
    )  # [k_max]
    valid = cluster_label > 0

    # membership one-hot against the k_max selected labels
    member = flat[None, :] == cluster_label[:, None]  # [k_max, HW]
    member = member & present[None, :]
    cnt = member.sum(-1)

    rr = (jnp.arange(h * w, dtype=jnp.float32) // w)
    cc = (jnp.arange(h * w, dtype=jnp.float32) % w)
    mf = member.astype(jnp.float32)
    denom = jnp.maximum(cnt, 1).astype(jnp.float32)
    mr = (mf * rr).sum(-1) / denom
    mc = (mf * cc).sum(-1) / denom
    dr = rr[None] - mr[:, None]
    dc = cc[None] - mc[:, None]
    mu_rr = (mf * dr * dr).sum(-1) / denom + 1.0 / 12.0
    mu_cc = (mf * dc * dc).sum(-1) / denom + 1.0 / 12.0
    mu_rc = (mf * dr * dc).sum(-1) / denom
    # eigenvalues of [[mu_rr, mu_rc], [mu_rc, mu_cc]]
    tr = mu_rr + mu_cc
    det = mu_rr * mu_cc - mu_rc * mu_rc
    disc = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    l1 = 0.5 * tr + disc
    l2 = 0.5 * tr - disc
    orientation = 0.5 * jnp.arctan2(2.0 * mu_rc, mu_rr - mu_cc)
    return ClusterStats(
        centroid_rc=jnp.stack([mr, mc], -1),
        orientation=orientation,
        axis_major=4.0 * jnp.sqrt(jnp.maximum(l1, 0.0)),
        axis_minor=4.0 * jnp.sqrt(jnp.maximum(l2, 0.0)),
        count=cnt,
        valid=valid & (cnt > 0),
    )
