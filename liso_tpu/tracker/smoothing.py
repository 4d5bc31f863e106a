"""Batched track smoothing: jit-ed Adam jerk minimisation on device.

Behavioral reference: liso/tracker/track_smoothing.py:38-290
(BatchedSmoothTrack / smooth_track_jerk). The reference runs a 2000-iteration
torch Adam loop per mining round; here the whole optimisation is one jitted
lax.fori_loop over padded [T_max] track tensors:

  loss = mean(|diff^3 pos|) + 3.0 * mean(|pos - observed|^2)

with the first position frozen (the reference keeps initial_pos out of the
parameters). Afterwards yaw is re-aligned to the smoothed travel direction
with iteratively growing frame skips until displacement exceeds 1 m, and
velocity = per-frame displacement, exactly like the reference.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

MIN_TRACK_LEN_FOR_SMOOTHING = 4


def _jerk_magnitude(pos: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 3] -> [B, T] (zero-padded third difference norm)."""
    jerk = jnp.linalg.norm(jnp.diff(pos, n=3, axis=1), axis=-1)
    pad = pos.shape[1] - jerk.shape[1]
    return jnp.pad(jerk, ((0, 0), (0, pad)))


def _displacement(pos: jnp.ndarray, num_skip: int = 1) -> jnp.ndarray:
    """[B, T, 3] -> [B, T] displacement over num_skip frames, edge-padded
    (track_smoothing.batched_displacement_from_pos)."""
    disp = jnp.linalg.norm(pos[:, num_skip:] - pos[:, :-num_skip], axis=-1)
    if num_skip == 1:
        return jnp.concatenate([disp, disp[:, -1:]], axis=1)
    lo = num_skip // 2
    hi = num_skip - lo
    return jnp.concatenate(
        [disp[:, :lo], disp, disp[:, -hi:]], axis=1
    )


def _masked_mean(x, mask):
    return jnp.where(mask, x, 0.0).sum(-1) / jnp.maximum(mask.sum(-1), 1)


@partial(jax.jit, static_argnames=("max_iters",))
def smooth_track_jerk(
    observed_pos: jnp.ndarray,  # [B, T, 3]
    valid: jnp.ndarray,  # [B, T]
    observed_yaw: jnp.ndarray,  # [B, T, 1]
    max_iters: int = 2000,
    learning_rate: float = 0.1,
    pos_regul_weight: float = 3.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (smoothed pos [B,T,3], aligned yaw [B,T,1], velo [B,T,1])."""
    b, t, _ = observed_pos.shape
    if t <= MIN_TRACK_LEN_FOR_SMOOTHING:
        return observed_pos, observed_yaw, _displacement(observed_pos)[..., None]

    init = observed_pos[:, 1:, :]
    tx = optax.adam(learning_rate)

    def loss_fn(free_pos):
        pos = jnp.concatenate([observed_pos[:, :1], free_pos], axis=1)
        jerk = _masked_mean(_jerk_magnitude(pos), valid)
        shift = ((pos - observed_pos) ** 2).sum(-1)
        regul = pos_regul_weight * _masked_mean(shift, valid)
        return (jerk + regul).mean()

    def body(_, carry):
        params, opt_state = carry
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    params, _ = jax.lax.fori_loop(
        0, max_iters, body, (init, tx.init(init))
    )
    pos = jnp.concatenate([observed_pos[:, :1], params], axis=1)

    # --- yaw alignment to travel direction, growing skip until the
    # displacement exceeds 1 m (track_smoothing.py:222-266)
    min_disp = 1.0
    yaw = observed_yaw[..., 0]
    aligned = ~valid
    max_skips = min(10, t // 2)
    for skip in range(1, max_skips + 1):
        disp = _displacement(pos, num_skip=skip)
        far = disp >= min_disp
        # orientation along track with this skip (central-ish difference)
        delta = pos[:, skip:] - pos[:, :-skip]
        ang = jnp.arctan2(delta[..., 1], delta[..., 0])
        lo = skip // 2
        hi = skip - lo
        ang = jnp.concatenate([ang[:, :lo] * 0 + ang[:, :1], ang, ang[:, -1:].repeat(hi, 1)], axis=1)
        can = (~aligned) & far
        yaw = jnp.where(can, ang, yaw)
        aligned = aligned | can
    # constant rotation at track start; copy second-to-last into last valid
    yaw = yaw.at[:, 0].set(yaw[:, 1])
    last = jnp.maximum(valid.sum(-1) - 1, 1)
    prev_of_last = jnp.maximum(last - 1, 0)
    bidx = jnp.arange(b)
    yaw = yaw.at[bidx, last].set(yaw[bidx, prev_of_last])

    velo = _displacement(pos)[..., None]
    return pos, yaw[..., None], velo
