"""SE(3) / SE(2) helpers (reference: liso/utils/torch_transformation.py:5-160).

All functions are pure jnp, jit- and vmap-friendly, and operate on
arbitrarily batched inputs: pose matrices are [..., 4, 4].
"""
from __future__ import annotations

import jax.numpy as jnp


def rot_z(theta: jnp.ndarray) -> jnp.ndarray:
    """[...,] yaw -> [..., 3, 3] rotation about +z."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zeros = jnp.zeros_like(theta)
    ones = jnp.ones_like(theta)
    rows = [
        jnp.stack([c, -s, zeros], axis=-1),
        jnp.stack([s, c, zeros], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def compose_matrix(
    t: jnp.ndarray | None = None,
    theta_z: jnp.ndarray | None = None,
    R: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Build [..., 4, 4] homogeneous pose from translation [..., 3] and
    either yaw [...] or rotation [..., 3, 3]
    (reference torch_compose_matrix, torch_transformation.py:5)."""
    if R is None:
        if theta_z is None:
            raise ValueError("need theta_z or R")
        R = rot_z(theta_z)
    batch = R.shape[:-2]
    if t is None:
        t = jnp.zeros(batch + (3,), R.dtype)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def decompose_matrix(T: jnp.ndarray):
    """[..., 4, 4] -> (t [..., 3], yaw [...]) assuming rotation about z
    (reference torch_decompose_matrix)."""
    t = T[..., :3, 3]
    yaw = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    return t, yaw


def invert_pose(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse: [R|t]^-1 = [R^T | -R^T t]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    return compose_matrix(t=ti, R=Rt)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] pose to [..., N, 3] points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def transform_flow(T: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Rotate [..., N, 3] flow vectors (no translation; reference
    homogenize_flow semantics: flow homogenized with w=0)."""
    R = T[..., :3, :3]
    return jnp.einsum("...ij,...nj->...ni", R, flow)


def homogenize_pcl(pts: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] -> [..., N, 4] with w=1."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def normalize_angle(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w, x, y, z) unit quaternion.

    Replaces the reference's pytorch3d dependency
    (eval/nuscenes_metrics_wrapper.py:22). Shepperd's branch-free method
    via jnp.where over the four candidate constructions.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate 0: trace dominant
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    # candidate 1: m00 dominant
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    # candidate 2: m11 dominant
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    # candidate 3: m22 dominant
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    c0 = 1.0 + tr
    c1 = 1.0 + m00 - m11 - m22
    c2 = 1.0 + m11 - m00 - m22
    c3 = 1.0 + m22 - m00 - m11
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    best = jnp.argmax(cands, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / (2.0 * safe_sqrt(jnp.take_along_axis(cands, best[..., None], axis=-1)))
    # canonicalize sign (w >= 0)
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q
