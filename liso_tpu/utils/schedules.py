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
    max_lr: float, total_steps: int, pct_start: float = 0.4,
    div_factor: float = 10.0, final_div_factor: float = 10.0,
) -> optax.Schedule:
    """torch OneCycleLR (anneal_strategy='cos') exact equivalent with the
    reference's mined-mode hyperparameters (liso_cli.py:792-823:
    pct_start 0.4, div_factor 10, final_div_factor 10, total sized to
    steps_per_round * drop_net_weights_every_nth_round + 2). Beyond
    total_steps the LR stays clamped at min_lr = max_lr / (div * final_div)
    — torch raises there, but the +2 sizing means training never reaches
    it; our rounds loop relies on the clamp for its final steps.
    Parity-tested against torch OneCycleLR in
    tests/test_reference_metric_parity.py."""
    total = max(int(total_steps), 10)
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch phase boundary: float(pct_start * total_steps) - 1
    up_steps = max(float(pct_start * total) - 1.0, 1.0)
    down_steps = max(total - 1.0 - up_steps, 1.0)

    def schedule(step):
        import jax.numpy as jnp

        s = jnp.asarray(step, jnp.float32)
        # torch _annealing_cos(start, end, pct) = end + (start-end)/2 *
        # (1 + cos(pi * pct))
        pct_up = jnp.clip(s / up_steps, 0.0, 1.0)
        lr_up = max_lr + (initial_lr - max_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * pct_up)
        )
        pct_dn = jnp.clip((s - up_steps) / down_steps, 0.0, 1.0)
        lr_dn = min_lr + (max_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * pct_dn)
        )
        return jnp.where(s <= up_steps, lr_up, lr_dn)

    return schedule
