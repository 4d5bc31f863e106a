"""Checkpoint save/restore via orbax.

Behavioral reference: liso/kabsch/liso_cli.py:726-789 (detector checkpoints
{network, optimizer, lr_scheduler, global_step} named <step>, resume parses
the step and restores everything) and slim/experiment.py:553-556 (SLIM
state_dict every 5k; the MovingAverageThreshold histogram lives in the state
so the self-tuned threshold survives — here it is part of the train-state
pytree automatically). The scheduler needs no replay: optax schedules are
pure functions of the restored step.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir, step: int, state: Any):
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    target = ckpt_dir / str(step)
    if target.exists():  # orbax refuses overwrites; same-step resave wins
        import shutil

        shutil.rmtree(target)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(target, state)
    ckptr.wait_until_finished()
    return target


def latest_step(ckpt_dir) -> Optional[int]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = [int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir, step: int, target: Any) -> Any:
    """target: a state pytree with the right structure (e.g. from
    init_state) used as the restore template."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(ckpt_dir).absolute() / str(step), target)
