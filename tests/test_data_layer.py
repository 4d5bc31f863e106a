"""Data layer tests: synthetic dataset, padding, flow consistency,
augmentation, pipeline."""
import numpy as np
import pytest

from liso_tpu.data.augmentation import (
    BoxAugmCfg,
    augment_sample_content,
    paste_boxes_into_sample,
)
from liso_tpu.data.dataset import DataCfg, collate
from liso_tpu.data.pipeline import Prefetcher
from liso_tpu.data.synthetic import SyntheticDataset
from liso_tpu.ops.bev import BevSetup

CFG = DataCfg(
    bev=BevSetup((40.0, 40.0), (64, 64)),
    n_max=8192,
    m_max=16384,
    k_max_boxes=8,
    use_skip_frames="never",
)


def test_synthetic_sample_shapes():
    ds = SyntheticDataset(CFG, n_frames=4)
    s = ds[0]
    assert s.frame_t0.pcl.shape == (8192, 4)
    assert s.frame_t0.valid.sum() > 1000
    assert s.flow_t0_t1.shape == (8192, 3)
    assert s.gt_boxes is not None and s.gt_boxes["pos"].shape == (8, 3)
    assert s.gt_boxes["valid"].sum() == 2
    # ground removed from the cropped view
    v = s.frame_t0.valid
    assert s.frame_t0.pcl[v][:, 2].min() > -1.6
    # full view keeps ground
    fv = s.frame_t0.full_valid
    assert s.frame_t0.pcl_full[fv][:, 2].min() < -1.6


def test_gt_flow_matches_object_motion():
    ds = SyntheticDataset(CFG, n_frames=4)
    s = ds[0]
    v = s.frame_t0.valid
    flow = s.flow_t0_1 if hasattr(s, "flow_t0_1") else s.flow_t0_t1
    mag = np.linalg.norm(flow[v], axis=-1)
    # moving-object points have flow ~ their speed; ego-motion flow for
    # static points = 0.5 m/frame backwards
    assert mag.max() > 0.7
    assert np.isfinite(flow).all()
    # consistency: warping t0 points by flow should land near t1 points
    p0 = s.frame_t0.pcl[v][:, :3]
    warped = p0 + flow[v]
    p1 = s.frame_t1.pcl[s.frame_t1.valid][:, :3]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(p1).query(warped, k=1)
    assert np.median(d) < 0.3, np.median(d)


def test_skip_frames_doubles_time_delta():
    ds = SyntheticDataset(CFG._replace(use_skip_frames="only"), n_frames=4)
    s = ds[0]
    assert s.time_delta_s == pytest.approx(0.2)


def test_global_augmentation_consistency():
    ds = SyntheticDataset(CFG, n_frames=4)
    content = ds.load_sample_dict(0)
    rng = np.random.RandomState(0)
    aug = augment_sample_content(content, rng)
    T = aug["_augm_T"]
    # points transformed
    p_orig = content["pcl_t0"][:, :3]
    p_aug = aug["pcl_t0"][:, :3]
    assert np.allclose(p_aug, p_orig @ T[:3, :3].T + T[:3, 3], atol=1e-5)
    # odom conjugated: aug_odom = T O T^-1
    o = np.asarray(content["odom_t0_t1"])
    assert np.allclose(aug["odom_t0_t1"], T @ o @ np.linalg.inv(T), atol=1e-9)
    # boxes moved with the points: box center still inside its point cluster
    b_aug = aug["gt"]["boxes"]
    b_orig = content["gt"]["boxes"]
    assert np.allclose(
        b_aug["pos"], b_orig["pos"] @ T[:3, :3].T + T[:3, 3], atol=1e-5
    )
    # flow rotated only
    f = content["gt"]["flow_t0_t1"]
    assert np.allclose(aug["gt"]["flow_t0_t1"], f @ T[:3, :3].T, atol=1e-5)


def test_copy_paste_augmentation():
    rng = np.random.RandomState(0)
    # build a tiny augm db with one snippet
    snippet = rng.uniform(-1, 1, (200, 4)).astype(np.float32) * [2, 1, 0.8, 1]
    db = {
        "pcl_in_box_cosy": [snippet],
        "lidar_rows": [rng.randint(0, 64, 200)],
        "boxes": {
            "pos": np.array([[8.0, 0.0, -1.0]], np.float32),
            "dims": np.array([[4.0, 2.0, 1.6]], np.float32),
            "rot": np.zeros((1, 1), np.float32),
            "probs": np.ones((1, 1), np.float32),
            "velo": np.zeros((1, 1), np.float32),
        },
        "box_T_sensor": np.eye(4)[None],
        "unique_track_id": np.array([7]),
    }
    pcl = rng.uniform(-15, 15, (1000, 4)).astype(np.float32)
    rows = rng.randint(0, 64, 1000)
    out_pcl, out_rows, boxes = paste_boxes_into_sample(
        pcl, rows, db, rng, (40.0, 40.0), BoxAugmCfg(max_num_objs=1,
                                                     max_points_dropout=0.0),
        occupied_xy=np.zeros((0, 2)),
    )
    assert len(out_pcl) > len(pcl)
    assert len(boxes["pos"]) == 1
    # pasted points sit near their box center
    n_new = len(out_pcl) - len(pcl)
    new_pts = out_pcl[-n_new:]
    d = np.linalg.norm(new_pts[:, :2] - boxes["pos"][-1][:2], axis=-1)
    assert d.max() < 4.0
    # pasted box keeps its range from sensor (density plausibility)
    assert abs(np.linalg.norm(boxes["pos"][0][:2]) - 8.0) < 1e-3


def test_collate_and_prefetcher():
    ds = SyntheticDataset(CFG, n_frames=6)
    loader = Prefetcher(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(iter(loader))
    assert len(batches) == 3
    b = batches[0]
    assert b["pcl_t0"].shape == (2, 8192, 4)
    assert b["odom_t0_t1"].shape == (2, 4, 4)
    assert b["target_boxes"]["pos"].shape == (2, 8, 3)
    assert len(b["sample_id"]) == 2


def test_raw_label_map_aggregations():
    """Raw-index label maps (reference labelmap/__init__.py over
    label_mappings.yml): nuScenes lidarseg indices -> static/dynamic/ground
    merged classes + colors."""
    import numpy as np

    from liso_tpu.data.labels import get_label_map_from_file

    lm = get_label_map_from_file(
        "nuscenes", "nuscenes2static_dynamic_ground",
        "nuscenes_static_dynamic_ground",
    )
    # 17=vehicle.car -> dynamic; 24=driveable_surface -> ground;
    # 28=static.manmade -> static; 0=noise -> ignore; 99 unknown -> -1
    raw = np.array([17, 24, 28, 0, 99])
    names = lm.mnames_of(raw)
    assert names == ["dynamic", "ground", "static", "ignore", "ignore"]
    colors = lm.colors_of(np.array([17, 28, 24]))
    assert colors.shape == (3, 4)
    np.testing.assert_allclose(colors[0], (1, 0, 0, 1))  # car red
    np.testing.assert_allclose(colors[1], (0, 1, 0, 1))  # manmade green
    np.testing.assert_allclose(colors[2], (0, 0, 1, 1))  # road blue

    # carla table with the generic static_dynamic_ground aggregation
    lm2 = get_label_map_from_file("carla", "static_dynamic_ground")
    assert lm2.mnames_of(np.array([10, 7, 1, 0])) == [
        "dynamic", "ground", "static", "ignore"
    ]
    # raw names outside the aggregation map to themselves (reference
    # _fill_mname_rname_dict_with_defaults)
    lm3 = get_label_map_from_file("carla")
    assert "car" in lm3.mnames
    assert lm3.midx_of(np.array([10]))[0] == lm3.mname_midx["car"]


def test_raw_label_map_unknown_color_is_zero():
    import numpy as np

    from liso_tpu.data.labels import get_label_map_from_file

    lm = get_label_map_from_file(
        "nuscenes", color_map_name="nuscenes_static_dynamic_ground"
    )
    colors = lm.colors_of(np.array([-1, 9999, 17]))
    np.testing.assert_allclose(colors[0], (0, 0, 0, 0))  # ignore -> zero row
    np.testing.assert_allclose(colors[1], (0, 0, 0, 0))
    np.testing.assert_allclose(colors[2], (1, 0, 0, 1))  # car stays red


def test_resolution_raydrop_augmentation():
    from liso_tpu.data.augmentation import resolution_raydrop_augmentation

    rng = np.random.RandomState(0)
    pts = rng.uniform(-20, 20, (5000, 4)).astype(np.float32)

    class FixedRng:
        """Pin the two rng.choice draws (resolution divisor, drop ratio)."""

        def __init__(self, divisor, ratio):
            self._draws = [divisor, ratio]

        def choice(self, options):
            return self._draws.pop(0)

    # drop_ratio 1 keeps everything
    keep = resolution_raydrop_augmentation(pts, FixedRng(900, 1))
    assert keep.all()
    # drop_ratio 2 keeps roughly a quarter (every 2nd azi x every 2nd ele)
    keep2 = resolution_raydrop_augmentation(pts, FixedRng(900, 2))
    frac = keep2.mean()
    assert 0.15 < frac < 0.4, frac
    # matches the explicit spherical re-discretization formula
    r = np.linalg.norm(pts[:, :3], axis=-1)
    azi = np.arctan2(pts[:, 1], pts[:, 0])
    ele = np.arccos(np.clip(pts[:, 2] / np.maximum(1e-5, r), -1, 1))
    res = 2 * np.pi / 900
    expect = ((azi / res).astype(np.int64) % 2 == 0) & (
        (ele / res).astype(np.int64) % 2 == 0
    )
    np.testing.assert_array_equal(keep2, expect)


def test_paste_boxes_resolution_raydrop_branch():
    """use_raydrop_augm now runs BOTH raydrop stages; pasted snippets still
    land with plausible membership (torch_dataset_commons.py:1600-1628)."""
    rng = np.random.RandomState(3)
    snippet = np.concatenate(
        [rng.uniform(-1.5, 1.5, (400, 3)), rng.rand(400, 1)], -1
    ).astype(np.float32)
    db = {
        "pcl_in_box_cosy": [snippet],
        "lidar_rows": [rng.randint(0, 64, 400)],
        "boxes": {
            "pos": np.array([[8.0, 0.0, -1.0]], np.float32),
            "dims": np.array([[4.0, 2.0, 1.6]], np.float32),
            "rot": np.zeros((1, 1), np.float32),
            "probs": np.ones((1, 1), np.float32),
            "velo": np.zeros((1, 1), np.float32),
        },
        "box_T_sensor": np.eye(4)[None],
        "unique_track_id": np.array([7]),
    }
    pcl = rng.uniform(-15, 15, (500, 4)).astype(np.float32)
    rows = rng.randint(0, 64, 500)
    out_pcl, out_rows, boxes = paste_boxes_into_sample(
        pcl, rows, db, rng, (40.0, 40.0),
        BoxAugmCfg(max_num_objs=1, max_points_dropout=0.0,
                   use_raydrop_augm=True),
        occupied_xy=np.zeros((0, 2)),
    )
    if len(boxes["pos"]):  # paste may be skipped by placement filters
        n_new = len(out_pcl) - len(pcl)
        assert 0 < n_new <= 400
        assert len(out_rows) == len(out_pcl)


def test_set_detect_anomaly_wires_jax_debug_nans():
    import jax
    import jax.numpy as jnp

    from liso_tpu.cli.common import set_detect_anomaly

    try:
        set_detect_anomaly(True)
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.zeros(()) - 1.0).block_until_ready()
    finally:
        set_detect_anomaly(False)
    assert not jax.config.jax_debug_nans


def test_lazy_icp_odom_and_jcp_ground_fallbacks():
    """Samples stored WITHOUT odometry / ground labels get them computed
    on the fly (the reference's lazy Waymo path,
    waymo_torch_dataset.py:295-335: kiss-icp ego-motion + JCP ground) and
    memoized."""
    import numpy as np

    from liso_tpu.data.dataset import DataCfg, LidarDataset
    from liso_tpu.data.synthetic import SyntheticSequence
    from liso_tpu.ops.bev import BevSetup

    seq = SyntheticSequence(n_frames=4, n_bg=4000, n_objects=0,
                            ego_speed=0.8)

    class Bare(LidarDataset):
        def __init__(self, cfg):
            super().__init__(cfg, sample_files=["s0"])

        def load_sample_dict(self, idx):
            c = seq.sample_dict(idx)
            # strip everything the ETL would precompute
            return {
                k: v for k, v in c.items()
                if not k.startswith(("odom_", "kiss_odom_", "is_ground_"))
            }

    cfg = DataCfg(
        bev=BevSetup((40.0, 40.0), (64, 64)), n_max=4096, m_max=8192,
        ground_label_source="jcp", use_skip_frames="never",
    )
    ds = Bare(cfg)
    content = ds.load_sample_dict(0)
    odom = ds._odom(content, "t0", "t1")
    true_odom = np.asarray(seq.sample_dict(0)["odom_t0_t1"])
    # pure x-translation ego motion; ICP must recover it to ~cm
    np.testing.assert_allclose(odom[:3, 3], true_odom[:3, 3], atol=0.15)
    np.testing.assert_allclose(odom[:3, :3], true_odom[:3, :3], atol=0.02)
    assert any(k[1] == "odom" for k in ds._lazy_cache)
    # jcp ground fallback: most true ground points labeled, sample builds
    pcl = np.asarray(content["pcl_t0"], np.float32)
    g = ds._ground_mask(content, "t0", pcl)
    true_g = pcl[:, 2] < -1.55
    recall = (g & true_g).sum() / max(true_g.sum(), 1)
    assert recall > 0.7, recall
    sample = ds[0]
    assert np.isfinite(sample.frame_t0.pcl).all()


def test_sample_rng_is_worker_assignment_invariant():
    """Lock-step multi-host DP (SURVEY 2.9) requires every replica to
    build bit-identical batches: per-sample randomness must be a pure
    function of (seed, epoch, idx), never of which worker/thread builds
    the sample (the reference PID-reseeds forks instead,
    torch_dataset_commons.py:74). Two loaders with different worker
    counts over the same dataset must yield identical epochs, and
    augmentation draws must differ across epochs."""
    import numpy as np

    from liso_tpu.data.dataset import DataCfg
    from liso_tpu.data.pipeline import Prefetcher
    from liso_tpu.data.synthetic import SyntheticDataset
    from liso_tpu.ops.bev import BevSetup

    cfg = DataCfg(
        bev=BevSetup((40.0, 40.0), (64, 64)), n_max=2048, m_max=4096,
        use_skip_frames="sometimes",
    )
    mk = dict(n_frames=8, n_objects=2, n_points=1024, cache_content=True,
              seed=0)

    def aug(content, rng):
        out = dict(content)
        out["pcl_t0"] = np.asarray(content["pcl_t0"]) + 0.01 * rng.randn(4)
        return out

    def epoch_arrays(num_workers):
        ds = SyntheticDataset(cfg, augmentation=aug, **mk)
        loader = Prefetcher(
            ds, batch_size=2, num_workers=num_workers, shuffle=True, seed=0,
        )
        return [np.asarray(b["pcl_t0"]) for b in loader]

    a = epoch_arrays(num_workers=0)
    b = epoch_arrays(num_workers=4)
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # epochs must differ (the loader bumps dataset.epoch per pass)
    ds = SyntheticDataset(cfg, augmentation=aug, **mk)
    loader = Prefetcher(ds, batch_size=2, num_workers=0, shuffle=False)
    e0 = [np.asarray(b["pcl_t0"]) for b in loader]
    e1 = [np.asarray(b["pcl_t0"]) for b in loader]
    assert any(not np.array_equal(x, y) for x, y in zip(e0, e1))
