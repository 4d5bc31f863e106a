"""Tests for small parity utilities."""
import jax.numpy as jnp
import numpy as np

from liso_tpu.data.dataset import DataCfg
from liso_tpu.data.synthetic import SyntheticDataset
from liso_tpu.ops.bev import BevSetup
from liso_tpu.utils.misc import (
    build_augmentation_db_from_groundtruth,
    limit_rotation_to_plusminus_half_pi_loss,
    rotation_vec_on_unit_circle_loss,
    sanity_check_flow,
)
from liso_tpu.utils.timing import StepTimer, timeit

CFG = DataCfg(bev=BevSetup((40.0, 40.0), (64, 64)), n_max=4096, m_max=12288,
              use_skip_frames="never")


def test_rotation_regularizers():
    unit = jnp.asarray([[0.6, 0.8], [1.0, 0.0]])
    assert float(rotation_vec_on_unit_circle_loss(unit)) < 1e-6
    assert float(rotation_vec_on_unit_circle_loss(2 * unit)) > 0.5
    assert float(limit_rotation_to_plusminus_half_pi_loss(jnp.asarray([0.5]))) == 0.0
    assert float(limit_rotation_to_plusminus_half_pi_loss(jnp.asarray([3.0]))) > 1.0


def test_sanity_check_flow_on_synthetic():
    ds = SyntheticDataset(CFG, n_frames=4)
    out = sanity_check_flow(ds, max_num_samples=2)
    # GT flow is consistent with itself: EPE 0
    assert out["AEE_overall"] < 1e-6


def test_gt_augm_db_builder():
    ds = SyntheticDataset(CFG, n_frames=4)
    db = build_augmentation_db_from_groundtruth(ds, max_samples=3)
    assert len(db["pcl_in_box_cosy"]) >= 3
    snip = db["pcl_in_box_cosy"][0]
    # snippets are in box coordinates: centered, within box dims
    assert np.abs(snip[:, :2]).max() < 3.0
    assert db["boxes"][0]["dims"].shape == (3,)


def test_step_timer_and_timeit():
    t = StepTimer()
    with t.section("fwd"):
        sum(range(1000))
    out = t.pop()
    assert "timing/fwd_s" in out and out["timing/fwd_s"] >= 0
    assert t.pop() == {}

    @timeit
    def f():
        return 42

    f()
    assert timeit.calls[f.__qualname__.replace("<locals>.", "<locals>.")] >= 1
