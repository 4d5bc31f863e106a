"""2D rotated-rectangle fitting to point clusters, vectorised for TPU.

Behavioral reference: liso/box_fitting/box_fitting.py:10-258 (MODEST-derived
fits). The reference loops over candidate angles in Python per cluster; here
every method is a masked angle-sweep evaluated in one shot (vmappable over
boxes), so refinement of all track boxes runs as one jitted call:

  * closeness_to_edge (default, delta=5deg -> 19 angles): maximise
    sum(1 / max(min(dist_to_edge_x, dist_to_edge_y), d0))
  * variance_to_edge: minimise variance of the closest-edge distances
  * min_area: minimise bounding-rectangle area (dense 1deg sweep instead of
    the reference's convex-hull edge angles — same optimum up to 1deg)
  * pca: principal component direction

All return (center_xy [2], length, width, yaw) of the fitted rectangle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e9


def _sweep_stats(pts: jnp.ndarray, mask: jnp.ndarray, angles: jnp.ndarray):
    """Project [N, 2] pts onto each angle frame. Returns per-angle
    (min_x, max_x, min_y, max_y, proj [A, N, 2])."""
    c, s = jnp.cos(angles), jnp.sin(angles)
    # rows of rotation matrix [[c, s], [-s, c]]
    px = c[:, None] * pts[None, :, 0] + s[:, None] * pts[None, :, 1]
    py = -s[:, None] * pts[None, :, 0] + c[:, None] * pts[None, :, 1]
    big = jnp.where(mask[None], 0.0, BIG)
    min_x = jnp.min(px + big, axis=1)
    max_x = jnp.max(px - big, axis=1)
    min_y = jnp.min(py + big, axis=1)
    max_y = jnp.max(py - big, axis=1)
    return min_x, max_x, min_y, max_y, px, py


def _finalize(pts, mask, angle):
    """Given the chosen angle, recompute extents; flip so length >= width
    (reference swaps to angle+pi/2 when x-extent < y-extent)."""
    def extents(a):
        c, s = jnp.cos(a), jnp.sin(a)
        px = c * pts[:, 0] + s * pts[:, 1]
        py = -s * pts[:, 0] + c * pts[:, 1]
        big = jnp.where(mask, 0.0, BIG)
        return (
            jnp.min(px + big), jnp.max(px - big),
            jnp.min(py + big), jnp.max(py - big),
        )

    mnx, mxx, mny, mxy = extents(angle)
    flip = (mxx - mnx) < (mxy - mny)
    angle = jnp.where(flip, angle + jnp.pi / 2, angle)
    mnx, mxx, mny, mxy = extents(angle)
    length = mxx - mnx
    width = mxy - mny
    cx_p = 0.5 * (mnx + mxx)
    cy_p = 0.5 * (mny + mxy)
    c, s = jnp.cos(angle), jnp.sin(angle)
    # unproject center: p = R(angle) x with R = [[c, s], [-s, c]] -> x = R^T p
    center = jnp.stack([c * cx_p - s * cy_p, s * cx_p + c * cy_p])
    return center, length, width, angle


@partial(jax.jit, static_argnames=("method",))
def fit_2d_box(
    pts_xy: jnp.ndarray,  # [N, 2]
    mask: jnp.ndarray,  # [N] bool
    method: str = "closeness_to_edge",
    delta_deg: float = 5.0,
    d0: float = 1e-2,
):
    """Returns (center [2], length, width, yaw). Invalid if < 2 masked pts
    (caller checks)."""
    if method == "pca":
        m = mask.astype(jnp.float32)
        cnt = jnp.maximum(m.sum(), 1.0)
        mean = (pts_xy * m[:, None]).sum(0) / cnt
        d = (pts_xy - mean) * m[:, None]
        cov = d.T @ d / cnt
        tr = cov[0, 0] + cov[1, 1]
        det = cov[0, 0] * cov[1, 1] - cov[0, 1] ** 2
        disc = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
        l1 = 0.5 * tr + disc
        angle = jnp.arctan2(l1 - cov[0, 0], cov[0, 1] + 1e-12)
        return _finalize(pts_xy, mask, angle)

    if method == "closeness_to_edge":
        angles = jnp.deg2rad(jnp.arange(0.0, 90.0 + delta_deg, delta_deg))
        mnx, mxx, mny, mxy, px, py = _sweep_stats(pts_xy, mask, angles)
        dx = jnp.minimum(px - mnx[:, None], mxx[:, None] - px)
        dy = jnp.minimum(py - mny[:, None], mxy[:, None] - py)
        beta = 1.0 / jnp.maximum(jnp.minimum(dx, dy), d0)
        score = jnp.where(mask[None], beta, 0.0).sum(1)
        best = jnp.argmax(score)
    elif method == "variance_to_edge":
        angles = jnp.deg2rad(jnp.arange(0.0, 90.0 + delta_deg, delta_deg))
        mnx, mxx, mny, mxy, px, py = _sweep_stats(pts_xy, mask, angles)
        dx = jnp.minimum(px - mnx[:, None], mxx[:, None] - px)
        dy = jnp.minimum(py - mny[:, None], mxy[:, None] - py)
        mx = (dx < dy) & mask[None]
        my = (dy < dx) & mask[None]

        def masked_var(v, m):
            cnt = jnp.maximum(m.sum(1), 1.0)
            mean = jnp.where(m, v, 0.0).sum(1) / cnt
            var = jnp.where(m, (v - mean[:, None]) ** 2, 0.0).sum(1) / cnt
            return jnp.where(m.any(1), var, 0.0)

        score = -(masked_var(dx, mx) + masked_var(dy, my))
        best = jnp.argmax(score)
    elif method == "min_area":
        angles = jnp.deg2rad(jnp.arange(0.0, 90.0, 1.0))
        mnx, mxx, mny, mxy, _, _ = _sweep_stats(pts_xy, mask, angles)
        area = (mxx - mnx) * (mxy - mny)
        best = jnp.argmin(area)
    else:
        raise ValueError(method)
    return _finalize(pts_xy, mask, angles[best])
