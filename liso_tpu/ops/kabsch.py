"""Differentiable weighted Kabsch rigid alignment.

Reference: liso/slim/slim_loss/weighted_pc_alignment.py:10-80 (unbatched),
liso/kabsch/kabsch_mask.py:445-508 (batched slotted variant) and
liso/torch_symm_ortho/__init__.py:7-87 (custom SVD-orthogonalization
backward). The reference runs the SVD in float64 for stability; TPU fp64 is
emulated and slow, so we keep everything fp32 but (a) normalise the
cross-covariance by the weight sum before the SVD and (b) use the same
hand-derived UV^T backward as the reference, which avoids the 1/(d_i - d_j)
singularity of the generic SVD gradient.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-7


@jax.custom_vjp
def symmetric_orthogonalization(A: jnp.ndarray) -> jnp.ndarray:
    """Closest orthogonal matrix R = U V^h to A [..., n, n]."""
    U, _, Vh = jnp.linalg.svd(A)
    return U @ Vh


def _so_fwd(A):
    U, D, Vh = jnp.linalg.svd(A)
    return U @ Vh, (U, D, Vh)


def _so_bwd(res, gR):
    U, D, Vh = res
    n = D.shape[-1]
    # dl_plus_dk: +eye keeps the diagonal denominators away from zero
    # (reference grad_compute_symmetric_orthogonalization)
    dl_plus_dk = D[..., :, None] + D[..., None, :] + jnp.eye(n, dtype=D.dtype)
    V = jnp.swapaxes(Vh, -1, -2)
    omega = (
        U[..., :, None, :, None] * V[..., None, :, None, :]
        - U[..., :, None, None, :] * V[..., None, :, :, None]
    ) / dl_plus_dk[..., None, None, :, :]
    dR_dA = U[..., None, None, :, :] @ omega @ Vh[..., None, None, :, :]
    gA = jnp.einsum("...ijkl,...kl->...ij", dR_dA, gR)
    return (gA,)


symmetric_orthogonalization.defvjp(_so_fwd, _so_bwd)


def weighted_kabsch(
    x: jnp.ndarray,
    y: jnp.ndarray,
    w: jnp.ndarray,
    use_epsilon_on_weights: bool = False,
):
    """Weighted rigid alignment: find T = [R|t] minimising sum_i w_i
    ||R x_i + t - y_i||^2.

    x, y: [..., N, 3]; w: [..., N] (>= 0). Broadcasting over leading dims is
    supported (e.g. x [B, 1, N, 3] against w [B, S, N] for the slotted
    decoder variant).

    Returns (T [..., 4, 4] float32, not_enough_points [...] bool). When fewer
    than 3 points carry weight, EPSILON is added to every weight (matching
    the reference fallback) which drives the solution towards identity-ish
    alignment of the padded cloud.
    """
    w = jnp.maximum(w, 0.0)
    enough = (w > 0).sum(axis=-1) >= 3
    if use_epsilon_on_weights:
        w = w + EPSILON
    else:
        w = jnp.where(enough[..., None], w, w + EPSILON)

    cum = w.sum(axis=-1)[..., None]  # [..., 1]
    mx = (x * w[..., None]).sum(axis=-2) / cum
    my = (y * w[..., None]).sum(axis=-2) / cum
    xc = x - mx[..., None, :]
    yc = y - my[..., None, :]
    # Sxy = sum_i w_i yc_i xc_i^T / sum w  (maps x-frame -> y-frame)
    sxy = jnp.einsum("...ni,...nj->...ij", yc * w[..., None], xc) / cum[..., None]
    R = symmetric_orthogonalization(sxy)
    t = my - jnp.einsum("...ij,...j->...i", R, mx)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R).at[..., :3, 3].set(t).at[..., 3, 3].set(1.0)
    return T, ~enough


def kabsch_from_flow(
    pts: jnp.ndarray, flow: jnp.ndarray, w: jnp.ndarray, **kw
):
    """Rigid transform explaining per-point flow: aligns pts -> pts + flow
    (reference get_kabsch_trafos_from_point_flow, kabsch_mask.py:328-399)."""
    return weighted_kabsch(pts, pts + flow, w, **kw)
