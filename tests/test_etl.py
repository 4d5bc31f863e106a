"""ETL component tests: ICP odometry (native + fallback), JCP ground
removal, KITTI dataset reading the ETL npy format."""
from pathlib import Path

import numpy as np
import pytest

from liso_tpu.data.dataset import DataCfg
from liso_tpu.data.ground import jpc_ground_remove
from liso_tpu.data.icp import (
    _icp_numpy,
    _load_native,
    icp_odometry,
    icp_register,
    voxel_downsample,
)
from liso_tpu.data.kitti import KittiRawDataset, KittiTrackingDataset
from liso_tpu.data.synthetic import SyntheticSequence
from liso_tpu.ops.bev import BevSetup


def lidar_like_scene(rng, n=6000):
    """Ground plane + walls + boxes, ~lidar distribution."""
    r = rng.uniform(3, 40, n)
    a = rng.uniform(-np.pi, np.pi, n)
    ground = np.stack(
        [r * np.cos(a), r * np.sin(a), np.full(n, -1.73) + rng.randn(n) * 0.02],
        -1,
    )
    walls = rng.uniform(-30, 30, (n // 3, 3))
    walls[:, 2] = rng.uniform(-1.6, 1.5, len(walls))
    return np.concatenate([ground, walls]).astype(np.float64)


def beam_structured_scene(n_rings=32, n_az=360, sensor_z=-1.73):
    """Scanner-realistic scene: one return per (ring, azimuth) beam — flat
    ground with a few wall segments blocking some azimuths."""
    elevations = np.deg2rad(np.linspace(-24.0, 2.0, n_rings))
    azimuths = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    pts = []
    for ele in elevations:
        for az in azimuths:
            # wall at 15 m for azimuths in [0.5, 1.5] rad
            if 0.5 < az < 1.5:
                r_wall = 15.0 / max(np.cos(ele), 1e-3)
                z = sensor_z + 1.73 + r_wall * np.sin(ele)
                if -1.73 < z < 2.0:  # beam hits the wall
                    pts.append(
                        [15.0 * np.cos(az), 15.0 * np.sin(az), z]
                    )
                    continue
            if ele < -1e-3:  # beam hits the ground plane
                r = -1.73 / np.tan(ele)
                if r < 70.0:
                    pts.append(
                        [r * np.cos(az), r * np.sin(az), sensor_z + 1.73 - 1.73]
                    )
    return np.asarray(pts, np.float64)


def test_native_lib_loads():
    lib = _load_native()
    assert lib, "native/libliso_native.so missing — run make -C native"


def test_voxel_downsample():
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 10, (5000, 3))
    ds = voxel_downsample(pts, 1.0)
    assert 500 < len(ds) < 1800  # ~10^3 voxels occupied
    # all original voxels represented
    keys = set(map(tuple, np.floor(pts / 1.0).astype(int)))
    dkeys = set(map(tuple, np.floor(ds / 1.0).astype(int)))
    assert dkeys <= keys


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_icp_recovers_known_transform(impl):
    rng = np.random.RandomState(0)
    tgt = lidar_like_scene(rng)
    theta = 0.03
    c, s = np.cos(theta), np.sin(theta)
    T_true = np.eye(4)
    T_true[:2, :2] = [[c, -s], [s, c]]
    T_true[:3, 3] = [0.4, 0.1, 0.0]
    # source = target moved by inv(T_true): registering source->target
    # should recover T_true
    src = (tgt - T_true[:3, 3]) @ np.linalg.inv(T_true[:3, :3]).T
    if impl == "native":
        T = icp_register(src, tgt, np.eye(4), voxel=1.0, max_corr_dist=1.0)
    else:
        T = _icp_numpy(src, tgt, np.eye(4), 1.0, 30)
    assert np.allclose(T[:3, 3], T_true[:3, 3], atol=0.05), T
    assert np.allclose(T[:3, :3], T_true[:3, :3], atol=0.01)


def test_icp_odometry_on_synthetic_drive():
    seq = SyntheticSequence(n_frames=6, ego_speed=0.5, seed=0)
    rng = np.random.RandomState(1)
    scans = []
    for t in range(5):
        pts_w, _, _ = seq.frame_world(t)
        s_T_w = np.linalg.inv(seq.world_T_sensor(t))
        p = pts_w[:, :3] @ s_T_w[:3, :3].T + s_T_w[:3, 3]
        scans.append(p + rng.randn(*p.shape) * 0.01)
    poses = icp_odometry(scans, voxel=0.8, max_corr_dist=1.2)
    assert len(poses) == 5
    # recovered ego motion ~ 0.5 m/frame in +x
    for t in range(1, 5):
        assert abs(poses[t][0, 3] - 0.5 * t) < 0.15, (t, poses[t][0, 3])
        assert abs(poses[t][1, 3]) < 0.15


def test_jpc_ground_remove():
    pts = beam_structured_scene()
    is_ground = jpc_ground_remove(pts.astype(np.float32), range_img_width=360,
                                  range_img_height=32)
    truth = pts[:, 2] < -1.55
    usable = (np.linalg.norm(pts[:, :2], axis=1) > 3.5) & (
        np.linalg.norm(pts[:, :2], axis=1) < 65
    )
    agree = (is_ground == truth)[usable].mean()
    assert agree > 0.9, agree
    # wall points specifically must be detected as non-ground
    wall = ~truth & usable
    assert (~is_ground[wall]).mean() > 0.8


def test_kitti_dataset_reads_etl_format(tmp_path):
    """Write synthetic samples in the ETL npy format, read via the KITTI
    dataset classes."""
    seq = SyntheticSequence(n_frames=6, seed=0)
    d = tmp_path / "kitti_raw"
    d.mkdir()
    for t in range(4):
        content = seq.sample_dict(t)
        content["name"] = f"2011_09_26_0001_{t:010d}"
        # objects for the tracking variant
        boxes = content["gt"]["boxes"]
        k = len(boxes["pos"])
        poses = np.tile(np.eye(4)[None], (k, 1, 1))
        yaw = boxes["rot"][:, 0]
        poses[:, 0, 0] = np.cos(yaw)
        poses[:, 0, 1] = -np.sin(yaw)
        poses[:, 1, 0] = np.sin(yaw)
        poses[:, 1, 1] = np.cos(yaw)
        poses[:, :3, 3] = boxes["pos"]
        content["gt"]["objects_t0"] = {
            "poses": poses,
            "size": boxes["dims"],
            "category": np.array(["Car"] * k),
        }
        np.save(d / content["name"], content)

    cfg = DataCfg(bev=BevSetup((40.0, 40.0), (64, 64)), n_max=4096,
                  m_max=12288, use_skip_frames="never")
    ds = KittiRawDataset(cfg, tmp_path)
    assert len(ds) == 4
    assert ds.num_sequences == 1
    assert ds.get_consecutive_sample_idxs_for_sequence(0) == [0, 1, 2, 3]
    s = ds[0]
    assert s.frame_t0.valid.sum() > 500
    assert np.isfinite(s.flow_t0_t1).all()

    # tracking variant extracts GT boxes (same files, pass the dir directly)
    ds2 = KittiTrackingDataset(cfg, d)
    s2 = ds2[0]
    assert s2.gt_boxes is not None
    assert s2.gt_boxes["valid"].sum() == 2
    assert (s2.gt_boxes["class_id"][s2.gt_boxes["valid"]] == 0).all()


class TestAV2Create:
    """Devkit-free AV2 ETL (liso_tpu/data/create_av2.py vs reference
    liso/datasets/argoverse2/create.py)."""

    def _make_log(self, root, log_id="log01", n_frames=4):
        import pyarrow as pa
        import pyarrow.feather as feather

        rng = np.random.RandomState(0)
        log = root / log_id
        (log / "sensors" / "lidar").mkdir(parents=True)
        ts0 = 315967000000000000
        poses = {"timestamp_ns": [], "qw": [], "qx": [], "qy": [], "qz": [],
                 "tx_m": [], "ty_m": [], "tz_m": []}
        for i in range(n_frames):
            ts = ts0 + i * 100_000_000
            n = 400
            pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
            pts[:, 2] = rng.uniform(-1.8, 1.0, n)
            tbl = pa.table({
                "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
                "intensity": rng.randint(0, 255, n).astype(np.uint8),
                "laser_number": rng.randint(0, 32, n).astype(np.uint8),
                "offset_ns": np.zeros(n, np.int32),
            })
            feather.write_feather(tbl, log / "sensors" / "lidar" / f"{ts}.feather")
            poses["timestamp_ns"].append(ts)
            for k, v in (("qw", 1.0), ("qx", 0.0), ("qy", 0.0), ("qz", 0.0),
                         ("tx_m", 2.0 * i), ("ty_m", 0.0), ("tz_m", 0.0)):
                poses[k].append(v)
        feather.write_feather(pa.table(poses), log / "city_SE3_egovehicle.feather")
        anno = pa.table({
            "timestamp_ns": [ts0, ts0],
            "category": ["REGULAR_VEHICLE", "PEDESTRIAN"],
            "length_m": [4.5, 0.8], "width_m": [2.0, 0.8],
            "height_m": [1.6, 1.8],
            "qw": [1.0, 1.0], "qx": [0.0, 0.0], "qy": [0.0, 0.0],
            "qz": [0.0, 0.0],
            "tx_m": [10.0, -5.0], "ty_m": [3.0, 2.0], "tz_m": [0.0, 0.0],
            "num_interior_pts": [25, 12],
        })
        feather.write_feather(anno, log / "annotations.feather")
        return log

    def test_convert_log(self, tmp_path):
        from liso_tpu.data.create_av2 import convert_log

        log = self._make_log(tmp_path)
        out = tmp_path / "converted"
        n = convert_log(log, out, use_icp=False)
        assert n == 2  # 4 frames -> 2 triplets
        files = sorted(out.glob("*.npy"))
        d = np.load(files[0], allow_pickle=True).item()
        assert d["pcl_t0"].shape[1] == 4
        assert d["is_ground_t0"].dtype == bool
        # ego moved +2 m in x between frames
        np.testing.assert_allclose(d["odom_t0_t1"][0, 3], 2.0, atol=1e-6)
        assert "kiss_odom_t0_t1" in d
        obj = d["objects_t0"]
        assert list(obj["category"]) == ["REGULAR_VEHICLE", "PEDESTRIAN"]
        np.testing.assert_allclose(obj["poses"][0][:3, 3], [10.0, 3.0, 0.0])
        # the converted sample feeds the AV2 reader's box extraction
        from liso_tpu.data.kitti import _boxes_from_objects
        from liso_tpu.data.labels import LabelMap

        av2_map = LabelMap(
            {"REGULAR_VEHICLE": "car", "PEDESTRIAN": "pedestrian"}
        )
        boxes = _boxes_from_objects(obj, av2_map)
        assert boxes["pos"].shape == (2, 3)
