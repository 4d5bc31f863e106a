"""LR schedules (reference: liso/utils/learning_rate.py:4-55 and the
OneCycle detector schedule, liso/kabsch/liso_cli.py:792-823)."""
from __future__ import annotations

import optax


def polynomial_decay_with_warmup(
    initial_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    lr_end_factor: float = 0.05,
    power: float = 1.0,
) -> optax.Schedule:
    """Linear warmup 0 -> initial, then polynomial decay to
    initial*lr_end_factor (the reference passes lr_end = initial * 0.05,
    slim/experiment.py:214-219)."""
    lr_end = initial_lr * lr_end_factor

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps) * initial_lr
        decay_steps = max(1, num_training_steps - num_warmup_steps)
        pct_remaining = 1.0 - (step - num_warmup_steps) / decay_steps
        pct_remaining = jnp.clip(pct_remaining, 0.0, 1.0)
        decayed = (initial_lr - lr_end) * pct_remaining**power + lr_end
        return jnp.where(step < num_warmup_steps, warm, decayed)

    return schedule


def onecycle(
    max_lr: float, total_steps: int, pct_start: float = 0.3, div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    """torch OneCycleLR (cosine annealing strategy) equivalent used for the
    detector (liso_cli.py:815-823). optax's onecycle NaNs when a phase has
    zero steps (fast-test configs with ~3 steps/round), so clamp."""
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 10),
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )
