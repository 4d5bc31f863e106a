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

# bump when trained-weight semantics change incompatibly; restore warns on
# older checkpoints. v2: corr window lookup switched from edge-clamping to
# the reference's zero padding + tap ordering (motion-encoder weights
# trained against v1 corr channels silently degrade).
FORMAT_VERSION = 2


def save_checkpoint(ckpt_dir, step: int, state: Any):
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    (ckpt_dir / "format_version").write_text(str(FORMAT_VERSION))
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
    import sys

    ckpt_dir = Path(ckpt_dir).absolute()
    vfile = ckpt_dir / "format_version"
    saved_v = int(vfile.read_text()) if vfile.exists() else 1
    if saved_v != FORMAT_VERSION:
        print(
            f"WARNING: checkpoint format v{saved_v} != current "
            f"v{FORMAT_VERSION} — weights trained before a semantics "
            "change (see utils/checkpoint.FORMAT_VERSION) will run but "
            "may be silently degraded",
            file=sys.stderr,
        )
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(ckpt_dir / str(step), target)


def check_checkpoint_config_sanity(ckpt_dir, cfg, keys=(
    "network.name", "data.img_grid_size", "data.bev_range_m",
)):
    """The restored checkpoint must come from a compatible config
    (reference networks/simple_net/simple_net_utils.py
    load_checkpoint_check_sanity): compares the config.yml saved next to
    the checkpoints against the current run's config on the
    architecture-defining keys. Missing config.yml -> no-op (externally
    produced checkpoints)."""
    from pathlib import Path

    import yaml

    for cand in (Path(ckpt_dir) / "config.yml",
                 Path(ckpt_dir).parent / "config.yml"):
        if cand.exists():
            saved = yaml.safe_load(open(cand))
            break
    else:
        return True

    def dig(tree, dotted):
        node = tree
        for part in dotted.split("."):
            if isinstance(node, dict):
                node = node.get(part)
            else:
                node = getattr(node, part, None)
            if node is None:
                return None
        return node

    def norm(v):
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    for dotted in keys:
        want = norm(dig(saved, dotted))
        got = norm(cfg.select(dotted) if hasattr(cfg, "select")
                   else dig(cfg, dotted))
        if want is not None and got is not None and want != got:
            raise ValueError(
                f"checkpoint config mismatch on {dotted}: "
                f"checkpoint={want!r} vs current={got!r}"
            )
    return True
