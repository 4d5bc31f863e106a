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


# ---------------------------------------------------------------------------
# Kinematic bicycle-model smoothing (track_smoothing.py:300-741)
# ---------------------------------------------------------------------------
def _cauchy(x):
    return 0.5 + jnp.arctan(x) / jnp.pi


def _soft_sigmoid_clamp(x, a_min, a_max):
    """track_smoothing.soft_sigmoid_clamp: smooth clamp via a Cauchy CDF of
    x/100 (keeps gradients alive at the bounds)."""
    return a_min + (a_max - a_min) * _cauchy(x / 100.0)


def _orientations_along_track(pos, num_skip: int = 2):
    """Track heading from skip-frame direction vectors, border-padded
    (track_smoothing.get_orientations_along_track)."""
    d = pos[:, num_skip:, :2] - pos[:, :-num_skip, :2]
    ang = jnp.arctan2(d[..., 1], d[..., 0])
    lo = num_skip // 2
    hi = num_skip - lo
    return jnp.concatenate(
        [jnp.repeat(ang[:, :1], lo, 1), ang, jnp.repeat(ang[:, -1:], hi, 1)],
        axis=1,
    )


def _bike_rollout(initial_state, accel, steer, dt, vehicle_length,
                  max_yaw_rate, max_velocity):
    """lax.scan over car_dynamics (track_smoothing.py:300-338 /
    forward_compiled:490-529). State: [x, y, heading, velo, yaw_rate];
    the model cannot go backwards (velo soft-clamped to [0, max])."""

    def step(state, u):
        a, dd = u
        x, y, h, v, hdot = (state[..., i] for i in range(5))
        new_hdot = _soft_sigmoid_clamp(
            hdot + dd * dt, -max_yaw_rate, max_yaw_rate
        )
        new_h = h + dt * jnp.abs(v) / vehicle_length * new_hdot
        new_v = _soft_sigmoid_clamp(v + a * dt, 0.0, max_velocity)
        new_x = x + new_v * jnp.cos(new_h) * dt
        new_y = y + new_v * jnp.sin(new_h) * dt
        new_state = jnp.stack([new_x, new_y, new_h, new_v, new_hdot], -1)
        return new_state, new_state

    _, states = jax.lax.scan(
        step, initial_state, (accel.T[:-1], steer.T[:-1])
    )
    return jnp.concatenate(
        [initial_state[None], states], axis=0
    ).transpose(1, 0, 2)  # [B, T, 5]


@partial(jax.jit, static_argnames=("max_iters",))
def smooth_track_bike_model(
    observed_pos: jnp.ndarray,  # [B, T, 3]
    valid: jnp.ndarray,  # [B, T]
    observed_yaw: jnp.ndarray,  # [B, T, 1]
    vehicle_length: jnp.ndarray,  # [B]
    time_between_frames_s: float = 0.1,
    max_iters: int = 1000,
    learning_rate: float = 0.1,
    accel_penalty_weight: float = 0.1,
    velo_penalty_weight: float = 0.1,
    pos_regul_weight: float = 1.0,
    max_velocity: float = 50.0,
    max_yaw_rate: float = jnp.pi / 2,
):
    """Kinematic-bicycle-model trajectory fit
    (track_smoothing.smooth_track_bike_model:577-741). The reference runs 30
    LBFGS(max_iter=20, strong-wolfe) outer steps on GPU; here one jitted
    Adam loop (same loss: accel/steering L2, super-max yaw-rate L2, position
    MSE, all masked per-track means). Returns (pos [B,T,3] with original z,
    yaw [B,T,1], velo [B,T,1])."""
    b, t, _ = observed_pos.shape
    if t < MIN_TRACK_LEN_FOR_SMOOTHING:
        return observed_pos, observed_yaw, _displacement(observed_pos)[..., None]

    dt = time_between_frames_s
    init_yaw = _orientations_along_track(observed_pos)
    velo_init = jnp.linalg.norm(
        observed_pos[:, 2:, :2] - observed_pos[:, :-2, :2], axis=-1
    ) / (2 * dt)
    velo_init = jnp.concatenate(
        [velo_init[:, :1], velo_init, velo_init[:, -1:]], axis=1
    )  # [B, T]
    yaw_step = (init_yaw[:, 1:] - init_yaw[:, :-1] + jnp.pi) % (
        2 * jnp.pi
    ) - jnp.pi
    hdot_obs = jnp.concatenate([yaw_step, yaw_step[:, -1:]], axis=1) / dt

    # warm start: the soft sigmoid clamp squashes its input by ~160x, so
    # holding a state value needs pre-clamp controls of O(100) — start the
    # controls at the clamp pre-images of the observed kinematics (gradient
    # descent cannot cover that scale from zero; the reference leans on
    # LBFGS line searches instead)
    def _pre_image(v, a_min, a_max):
        frac = jnp.clip((v - a_min) / (a_max - a_min), 0.02, 0.98)
        return 100.0 * jnp.tan(jnp.pi * (frac - 0.5))

    accel0 = (
        _pre_image(velo_init, 0.0, max_velocity)[:, 1:] - velo_init[:, :-1]
    ) / dt
    steer0 = (
        _pre_image(hdot_obs, -max_yaw_rate, max_yaw_rate)[:, 1:]
        - hdot_obs[:, :-1]
    ) / dt
    pad1 = lambda a: jnp.concatenate([a, a[:, -1:]], axis=1)
    params = {
        "accel": pad1(accel0),
        "steer": pad1(steer0),
        "pos0": observed_pos[:, 0, :2],
        "yaw0": init_yaw[:, :1],
        "velo0": velo_init[:, :1],
        "hdot0": hdot_obs[:, :1],
    }
    nvalid = jnp.maximum(valid.sum(-1), 1)

    def rollout(p):
        init = jnp.concatenate(
            [p["pos0"], p["yaw0"], p["velo0"], p["hdot0"]], axis=-1
        )
        return _bike_rollout(
            init, p["accel"], p["steer"], dt, vehicle_length,
            max_yaw_rate, max_velocity,
        )

    def loss_fn(p):
        states = rollout(p)
        lin_pen = accel_penalty_weight * _masked_mean(p["accel"] ** 2, valid)
        yaw_pen = accel_penalty_weight * _masked_mean(p["steer"] ** 2, valid)
        hdot = states[..., 4]
        rate_pen = velo_penalty_weight * _masked_mean(
            jnp.where(jnp.abs(hdot) > max_yaw_rate, hdot**2, 0.0), valid
        )
        shift = ((states[..., :2] - observed_pos[..., :2]) ** 2).sum(-1)
        regul = pos_regul_weight * _masked_mean(shift, valid)
        return (lin_pen + yaw_pen + rate_pen + regul).mean()

    tx = optax.adam(learning_rate)

    def body(_, carry):
        p, opt_state = carry
        grads = jax.grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state

    params, _ = jax.lax.fori_loop(0, max_iters, body, (params, tx.init(params)))
    states = rollout(params)
    pos = jnp.concatenate([states[..., :2], observed_pos[..., 2:]], axis=-1)
    yaw = states[..., 2:3]
    velo = _displacement(pos)[..., None]
    return pos, yaw, velo
