"""SlimExperiment train/eval/export/checkpoint integration (CPU, tiny)."""
import numpy as np

from liso_tpu.cli.common import apply_fast_test
from liso_tpu.data.dataset import DataCfg
from liso_tpu.data.synthetic import SyntheticDataset
from liso_tpu.ops.bev import BevSetup
from liso_tpu.train.slim_experiment import SlimExperiment
from liso_tpu.utils.config import parse_config

CFG_PATH = "liso_tpu/config/liso_config.yml"


def test_slim_experiment_end_to_end(tmp_path):
    cfg = apply_fast_test(
        parse_config(
            CFG_PATH,
            key_value_updates=[["SLIM", "model", "num_iters", "2"]],
        )
    )
    bev = BevSetup((40.0, 40.0), (64, 64))
    dcfg = DataCfg(bev=bev, n_max=4096, m_max=8192, use_skip_frames="never")
    train_ds = SyntheticDataset(dcfg, n_frames=4)
    val_ds = SyntheticDataset(dcfg, n_frames=2, seed=1)
    exp = SlimExperiment(cfg, bev, train_ds, val_ds, tmp_path)
    state = exp.run(max_steps=3)
    assert state is not None and int(state.step) == 3
    # checkpoint written at the end
    assert (tmp_path / "ckpts" / "3").exists()
    # flow eval produces finite metrics
    metrics = exp.evaluate(3, max_batches=1)
    assert np.isfinite(metrics["AEE_overall"])
    # export writes the full 6-pair npz schema
    n = exp.export_flow(train_ds, tmp_path / "preds", max_samples=1)
    assert n == 1
    d = np.load(tmp_path / "preds" / "synth0_0000.npz")
    for pair in ("t0_t1", "t1_t0", "t0_t2", "t2_t0", "t1_t2", "t2_t1"):
        assert f"bev_raw_flow_{pair}" in d
        assert f"bev_dynamicness_{pair}" in d
    assert "static_threshold" in d and "bev_range_m" in d
    # restore into a fresh experiment
    exp2 = SlimExperiment(cfg, bev, train_ds, val_ds, tmp_path)
    import jax

    from liso_tpu.data.dataset import collate
    from liso_tpu.train.slim_experiment import batch_to_flow_sample

    fs = batch_to_flow_sample(collate([train_ds[0]]))
    exp2.state = exp2.trainer.init_state(jax.random.PRNGKey(1), fs)
    exp2.maybe_restore()
    assert int(exp2.state.step) == 3


def test_moving_mask_translating_ego_static_scene_is_all_still():
    """VERDICT r1 bug 2: the moving/still split must include the odometry
    translation — a purely translating ego over a static scene must yield
    an all-still mask (reference eval_ours.py:340-358 semantics)."""
    from liso_tpu.train.slim_experiment import compute_moving_mask

    rng = np.random.RandomState(0)
    pts = rng.uniform(-30, 30, (500, 3)).astype(np.float64)
    odom = np.eye(4)
    odom[:3, 3] = [1.2, -0.3, 0.05]  # ~1 m/frame ego translation
    # static scene: GT flow of every point is exactly the rigid ego flow
    flow_gt = pts @ odom[:3, :3].T + odom[:3, 3] - pts
    mask = compute_moving_mask(pts, flow_gt, odom, thresh=0.5)
    assert not mask.any()
    # and a genuinely moving point is flagged
    flow_gt[0] += np.array([2.0, 0.0, 0.0])
    mask = compute_moving_mask(pts, flow_gt, odom, thresh=0.5)
    assert mask[0] and not mask[1:].any()
    # rotating ego, static scene: still all-still
    th = 0.1
    odom_r = np.eye(4)
    odom_r[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    odom_r[:3, 3] = [0.8, 0.1, 0.0]
    flow_r = pts @ odom_r[:3, :3].T + odom_r[:3, 3] - pts
    assert not compute_moving_mask(pts, flow_r, odom_r, thresh=0.5).any()
