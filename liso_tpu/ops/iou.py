"""Rotated-box BEV / 3D IoU, fully vectorised for TPU.

Reference: liso/iou3d_nms/src/iou3d_nms_kernel.cu (CUDA Sutherland-Hodgman
polygon clipping) + liso/utils/nms_iou.py:124-198 (IoU matrices; 3D IoU =
BEV overlap x z-interval intersection). The CUDA kernel's sequential clip
loop maps poorly to the VPU, so we compute the exact convex intersection
polygon branch-free instead: candidate vertices = corners of A inside B +
corners of B inside A + all 16 edge-edge intersections, masked, sorted by
angle around their centroid, then a masked shoelace. Same exact area for
rectangles, but every pair is pure data-parallel arithmetic.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def box_corners_bev(boxes_xywlr: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] (cx, cy, len_x, wid_y, yaw) -> [..., 4, 2] ccw corners."""
    cx, cy, lx, wy, r = (boxes_xywlr[..., i] for i in range(5))
    dx = jnp.stack([lx, -lx, -lx, lx], -1) * 0.5
    dy = jnp.stack([wy, wy, -wy, -wy], -1) * 0.5
    c, s = jnp.cos(r)[..., None], jnp.sin(r)[..., None]
    x = c * dx - s * dy + cx[..., None]
    y = s * dx + c * dy + cy[..., None]
    return jnp.stack([x, y], -1)


def _points_in_box(pts: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """pts [..., P, 2] inside rotated box [..., 5] -> [..., P] bool."""
    cx, cy, lx, wy, r = (box[..., i] for i in range(5))
    c, s = jnp.cos(r), jnp.sin(r)
    px = pts[..., 0] - cx[..., None]
    py = pts[..., 1] - cy[..., None]
    u = c[..., None] * px + s[..., None] * py
    v = -s[..., None] * px + c[..., None] * py
    return (jnp.abs(u) <= 0.5 * lx[..., None] + EPS) & (
        jnp.abs(v) <= 0.5 * wy[..., None] + EPS
    )


def _edge_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """All 16 segment-segment intersections between edges of two quads.

    ca, cb: [..., 4, 2]. Returns (pts [..., 16, 2], valid [..., 16])."""
    a0 = ca
    a1 = jnp.roll(ca, -1, axis=-2)
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=-2)
    # broadcast to [..., 4, 4, 2]
    p = a0[..., :, None, :]
    r = (a1 - a0)[..., :, None, :]
    q = b0[..., None, :, :]
    s = (b1 - b0)[..., None, :, :]
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = q - p
    t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / jnp.where(
        jnp.abs(rxs) < EPS, 1.0, rxs
    )
    u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / jnp.where(
        jnp.abs(rxs) < EPS, 1.0, rxs
    )
    ok = (jnp.abs(rxs) >= EPS) & (t >= -EPS) & (t <= 1 + EPS) & (u >= -EPS) & (u <= 1 + EPS)
    pt = p + t[..., None] * r
    sh = ok.shape[:-2]
    return pt.reshape(sh + (16, 2)), ok.reshape(sh + (16,))


def rotated_intersection_area(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Exact intersection area of two rotated rectangles.

    box_a, box_b: [..., 5] (cx, cy, len, wid, yaw) broadcastable. Returns
    [...] float32 area. Branch-free: works under vmap/jit for full [K, K]
    matrices at once.
    """
    shape = jnp.broadcast_shapes(box_a.shape, box_b.shape)
    box_a = jnp.broadcast_to(box_a, shape)
    box_b = jnp.broadcast_to(box_b, shape)
    ca = box_corners_bev(box_a)
    cb = box_corners_bev(box_b)
    in_b = _points_in_box(ca, box_b)  # [..., 4]
    in_a = _points_in_box(cb, box_a)  # [..., 4]
    ei, ei_ok = _edge_intersections(ca, cb)  # [..., 16, 2], [..., 16]

    pts = jnp.concatenate([ca, cb, ei], axis=-2)  # [..., 24, 2]
    ok = jnp.concatenate([in_b, in_a, ei_ok], axis=-1)  # [..., 24]

    n = ok.sum(axis=-1)
    okf = ok[..., None].astype(pts.dtype)
    centroid = (pts * okf).sum(axis=-2) / jnp.maximum(n[..., None], 1.0)
    d = pts - centroid[..., None, :]
    ang = jnp.arctan2(d[..., 1], d[..., 0])
    ang = jnp.where(ok, ang, jnp.inf)  # invalid sort to the end
    order = jnp.argsort(ang, axis=-1)
    sp = jnp.take_along_axis(pts, order[..., None], axis=-2)
    so = jnp.take_along_axis(ok, order, axis=-1)

    idx = jnp.arange(pts.shape[-2])
    nxt = jnp.where(idx[..., :] + 1 < n[..., None], idx + 1, 0)
    sp_next = jnp.take_along_axis(sp, nxt[..., None], axis=-2)
    cross = sp[..., 0] * sp_next[..., 1] - sp[..., 1] * sp_next[..., 0]
    cross = jnp.where(so & (idx < n[..., None]), cross, 0.0)
    area = 0.5 * jnp.abs(cross.sum(axis=-1))
    return jnp.where(n >= 3, area, 0.0)


def _as_bev5(pos, dims, rot):
    return jnp.concatenate(
        [pos[..., :2], dims[..., :2], rot[..., :1]], axis=-1
    )


def iou_matrix_bev(
    pos_a, dims_a, rot_a, pos_b, dims_b, rot_b,
    valid_a=None, valid_b=None,
) -> jnp.ndarray:
    """[Ka, ...] x [Kb, ...] -> IoU_bev [Ka, Kb]
    (reference utils/nms_iou.py:124 box_iou_matrix, mode iou_bev)."""
    a = _as_bev5(pos_a, dims_a, rot_a)  # [Ka, 5]
    b = _as_bev5(pos_b, dims_b, rot_b)  # [Kb, 5]
    inter = rotated_intersection_area(a[:, None, :], b[None, :, :])
    area_a = (dims_a[..., 0] * dims_a[..., 1])[:, None]
    area_b = (dims_b[..., 0] * dims_b[..., 1])[None, :]
    iou = inter / jnp.maximum(area_a + area_b - inter, EPS)
    if valid_a is not None:
        iou = jnp.where(valid_a[:, None], iou, 0.0)
    if valid_b is not None:
        iou = jnp.where(valid_b[None, :], iou, 0.0)
    return iou


def iou_matrix_3d(
    pos_a, dims_a, rot_a, pos_b, dims_b, rot_b,
    valid_a=None, valid_b=None,
) -> jnp.ndarray:
    """3D IoU: BEV overlap x z-interval overlap
    (reference utils/nms_iou.py:150-198, boxes are z-centered)."""
    a = _as_bev5(pos_a, dims_a, rot_a)
    b = _as_bev5(pos_b, dims_b, rot_b)
    inter_bev = rotated_intersection_area(a[:, None, :], b[None, :, :])
    za_lo = pos_a[:, 2] - 0.5 * dims_a[:, 2]
    za_hi = pos_a[:, 2] + 0.5 * dims_a[:, 2]
    zb_lo = pos_b[:, 2] - 0.5 * dims_b[:, 2]
    zb_hi = pos_b[:, 2] + 0.5 * dims_b[:, 2]
    z_ov = jnp.maximum(
        jnp.minimum(za_hi[:, None], zb_hi[None, :])
        - jnp.maximum(za_lo[:, None], zb_lo[None, :]),
        0.0,
    )
    inter = inter_bev * z_ov
    vol_a = jnp.prod(dims_a, -1)[:, None]
    vol_b = jnp.prod(dims_b, -1)[None, :]
    iou = inter / jnp.maximum(vol_a + vol_b - inter, EPS)
    if valid_a is not None:
        iou = jnp.where(valid_a[:, None], iou, 0.0)
    if valid_b is not None:
        iou = jnp.where(valid_b[None, :], iou, 0.0)
    return iou
