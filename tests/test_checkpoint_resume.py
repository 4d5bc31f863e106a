"""Checkpoint/resume semantics across the loop and SLIM trainers."""
import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.ops.bev import BevSetup
from liso_tpu.train.detector_train import DetectorTrainer
from liso_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from tests.test_detector import make_boxes, scene_with_objects

BEV = BevSetup((40.0, 40.0), (64, 64))


def test_detector_checkpoint_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    points = jnp.asarray(scene_with_objects(rng, n=1024))[None]
    valid = jnp.ones(points.shape[:2], bool)
    target = make_boxes(pos=[[5.0, 2.0, -1.0]], dims=[[4, 2, 1.5]],
                        rot=[[0.0]])
    trainer = DetectorTrainer(BEV, total_steps=20,
                              use_baseline_parameters=False)
    state = trainer.init_state(jax.random.PRNGKey(0), points, valid)
    for _ in range(3):
        state, _ = trainer.train_step(state, points, valid, target)
    save_checkpoint(tmp_path, 3, state)
    assert latest_step(tmp_path) == 3

    template = trainer.init_state(jax.random.PRNGKey(1), points, valid)
    restored = restore_checkpoint(tmp_path, 3, template)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    # optimizer state restored too: next step matches exactly
    s1, m1 = trainer.train_step(state, points, valid, target)
    s2, m2 = trainer.train_step(restored, points, valid, target)
    assert np.allclose(float(m1["loss/total"]), float(m2["loss/total"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_latest_step_empty(tmp_path):
    assert latest_step(tmp_path / "nope") is None


def test_liso_cli_resume_and_finetune(tmp_path):
    """Rounds-loop resume through the CLI (reference liso_cli.py:742-789):
    --load_checkpoint continues at the restored step with the restored
    mined DBs; --finetune keeps only the weights."""
    from liso_tpu.cli.liso_cli import main

    log1 = main(["--fast-test", "--summary_dir", str(tmp_path / "a")])
    ckpts = log1 / "ckpts"
    assert any(ckpts.iterdir())
    log2 = main([
        "--fast-test", "--summary_dir", str(tmp_path / "b"),
        "--load_checkpoint", str(ckpts),
    ])
    assert log2.exists()
    log3 = main([
        "--fast-test", "--summary_dir", str(tmp_path / "c"),
        "--load_checkpoint", str(ckpts), "--finetune",
    ])
    assert log3.exists()


def test_checkpoint_config_sanity(tmp_path):
    """Restoring with an incompatible config must fail fast (reference
    load_checkpoint_check_sanity)."""
    import pytest
    import yaml

    from liso_tpu.cli.common import DEFAULT_CFG
    from liso_tpu.utils.checkpoint import check_checkpoint_config_sanity
    from liso_tpu.utils.config import parse_config

    cfg = parse_config(str(DEFAULT_CFG), ["centerpoint"])
    ckpts = tmp_path / "ckpts"
    ckpts.mkdir()
    from liso_tpu.utils.config import save_config

    save_config(cfg, tmp_path / "config.yml")
    assert check_checkpoint_config_sanity(ckpts, cfg)

    other = parse_config(str(DEFAULT_CFG), ["transfusion"])
    with pytest.raises(ValueError, match="network.name"):
        check_checkpoint_config_sanity(ckpts, other)

    # no config.yml anywhere -> no-op
    isolated = tmp_path / "iso" / "ckpts"
    isolated.mkdir(parents=True)
    assert check_checkpoint_config_sanity(isolated, other)
