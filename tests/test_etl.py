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


class TestKittiTrackingCreate:
    """Devkit-free KITTI tracking ETL (liso_tpu/data/create_kitti_tracking
    vs reference liso/datasets/kitti/create_kitti_tracking.py): schema,
    GT object flow from annotated box motion, dataset consumption."""

    CAM_T_VELO = np.array(
        [[0.0, -1.0, 0.0, 0.0],
         [0.0, 0.0, -1.0, -0.08],
         [1.0, 0.0, 0.0, 0.27],
         [0.0, 0.0, 0.0, 1.0]]
    )

    def _make_tracking_root(self, root, seq="0000", n_frames=5):
        rng = np.random.RandomState(0)
        (root / "velodyne" / seq).mkdir(parents=True)
        (root / "label_02").mkdir(exist_ok=True)
        (root / "calib").mkdir(exist_ok=True)
        (root / "oxts").mkdir(exist_ok=True)
        # static scene + one car moving +1 m/frame in x (velo frame)
        static = rng.uniform(-25, 25, (3000, 3)).astype(np.float32)
        static[:, 2] = rng.uniform(-1.6, 1.2, len(static))
        label_lines = []
        velo_T_cam = np.linalg.inv(self.CAM_T_VELO)
        for t in range(n_frames):
            car_x = 8.0 + 1.0 * t
            car_pts = rng.uniform(-1.6, 1.6, (200, 3)).astype(np.float32)
            car_pts[:, 1] *= 0.55
            car_pts[:, 2] = rng.uniform(-0.6, 0.6, 200)
            car_pts[:, 0] += car_x
            car_pts[:, 2] += 0.0
            pcl = np.concatenate([static, car_pts])
            pcl4 = np.concatenate(
                [pcl, np.zeros((len(pcl), 1), np.float32)], -1
            )
            pcl4.astype(np.float32).tofile(
                root / "velodyne" / seq / f"{t:06d}.bin"
            )
            # object in cam coords: cam location of box BOTTOM center
            center_velo = np.array([car_x, 0.0, 0.0, 1.0])
            bottom_velo = center_velo - np.array([0, 0, 0.75, 0])
            loc_cam = (self.CAM_T_VELO @ bottom_velo)[:3]
            # rot_y giving identity orientation through velo_T_cam chain
            label_lines.append(
                f"{t} 1 Car 0 0 0.0 0 0 50 50 "
                f"1.5 1.3 3.8 {loc_cam[0]:.3f} {loc_cam[1]:.3f} "
                f"{loc_cam[2]:.3f} {-np.pi/2:.6f}"
            )
        (root / "label_02" / f"{seq}.txt").write_text(
            "\n".join(label_lines)
        )
        tr = self.CAM_T_VELO  # already rectified in this fixture
        calib = [
            "P0: " + " ".join(["0"] * 12),
            "P1: " + " ".join(["0"] * 12),
            "P2: " + " ".join(["0"] * 12),
            "P3: " + " ".join(["0"] * 12),
            "R_rect " + " ".join(str(x) for x in np.eye(3).ravel()),
            "Tr_velo_cam " + " ".join(str(x) for x in tr[:3].ravel()),
            "Tr_imu_velo " + " ".join(str(x) for x in np.eye(4)[:3].ravel()),
        ]
        (root / "calib" / f"{seq}.txt").write_text("\n".join(calib))
        # stationary ego (simple oxts: lat/lon/alt/rpy + zeros)
        oxts_line = "49.0 8.43 110.0 0.0 0.0 0.0 " + " ".join(["0"] * 24)
        (root / "oxts" / f"{seq}.txt").write_text(
            "\n".join([oxts_line] * n_frames)
        )
        return root

    def test_convert_and_flow(self, tmp_path):
        from liso_tpu.data.create_kitti_tracking import convert_sequence

        root = self._make_tracking_root(tmp_path / "training")
        out = tmp_path / "out"
        n = convert_sequence(root, "0000", out)
        assert n == 3  # 5 frames -> 3 triplets
        d = np.load(sorted(out.glob("*.npy"))[0], allow_pickle=True).item()
        for k in ("pcl_t0", "pcl_t1", "pcl_t2", "flow_t0_t1", "flow_t1_t0",
                  "flow_t0_t2", "flow_t2_t0", "track_ids_mask_t0",
                  "is_ground_t0", "odom_t0_t1", "odom_t0_t2", "objects_t0",
                  "kiss_odom_t0_t1", "name"):
            assert k in d, k
        assert d["objects_t0"]["poses"].shape == (1, 4, 4)
        # box pose lands at the annotated velo location with ~identity rot
        np.testing.assert_allclose(
            d["objects_t0"]["poses"][0, :3, 3], [8.0, 0.0, 0.0], atol=0.05
        )
        # KITTI object frames keep the camera convention (y = height axis,
        # reference get_kitti_tracking_object_cam_pose) — only the yaw
        # (x-axis direction in the velo plane) must be identity here
        R = d["objects_t0"]["poses"][0, :3, :3]
        np.testing.assert_allclose(R[:, 0], [1.0, 0.0, 0.0], atol=1e-5)
        # GT flow: points on the car move +1 m in x, static points ~0
        in_box = d["track_ids_mask_t0"] == 1
        assert in_box.sum() > 100
        np.testing.assert_allclose(
            d["flow_t0_t1"][in_box].mean(0), [1.0, 0.0, 0.0], atol=0.05
        )
        assert np.abs(d["flow_t0_t1"][~in_box]).max() < 1e-3
        # two-frame skip flow doubles
        np.testing.assert_allclose(
            d["flow_t0_t2"][in_box].mean(0), [2.0, 0.0, 0.0], atol=0.05
        )

    def test_dataset_reads_tracking_output(self, tmp_path):
        from liso_tpu.data.create_kitti_tracking import convert_sequence
        from liso_tpu.data.kitti import KittiTrackingDataset

        root = self._make_tracking_root(tmp_path / "training")
        out = tmp_path / "conv" / "kitti_tracking"
        convert_sequence(root, "0000", out)
        cfg = DataCfg(bev=BevSetup((60.0, 60.0), (64, 64)), n_max=4096,
                      m_max=12288, use_skip_frames="never")
        ds = KittiTrackingDataset(cfg, tmp_path / "conv")
        s = ds[0]
        assert s.gt_boxes is not None and s.gt_boxes["valid"].sum() == 1
        # track-derived speed ~10 m/s (1 m / 0.1 s)
        v = s.gt_boxes["velo"][s.gt_boxes["valid"]]
        np.testing.assert_allclose(v, 10.0, atol=0.5)
        # the loaded flow is the REAL object flow: moving points present
        fl = s.flow_t0_t1[s.frame_t0.valid]
        assert np.linalg.norm(fl, axis=-1).max() > 0.9
        # gt moving mask marks the car points
        assert s.gt_moving_mask[s.frame_t0.valid].sum() > 50


class TestKittiObjectCreate:
    """Devkit-free KITTI object ETL (liso_tpu/data/create_kitti_object vs
    reference create_kitti_object.py)."""

    def _make_object_root(self, root, n=3):
        rng = np.random.RandomState(1)
        for sub in ("velodyne", "label_2", "calib"):
            (root / "training" / sub).mkdir(parents=True)
        (root / "ImageSets").mkdir()
        for i in range(n):
            stem = f"{i:06d}"
            pcl = rng.uniform(-30, 30, (2000, 4)).astype(np.float32)
            pcl[:, 2] = rng.uniform(-1.7, 1.0, 2000)
            pcl.tofile(root / "training" / "velodyne" / f"{stem}.bin")
            cam = TestKittiTrackingCreate.CAM_T_VELO
            loc = (cam @ np.array([10.0, 2.0, -0.75, 1.0]))[:3]
            (root / "training" / "label_2" / f"{stem}.txt").write_text(
                f"Car 0 0 0.0 0 0 50 50 1.5 1.6 4.0 "
                f"{loc[0]:.3f} {loc[1]:.3f} {loc[2]:.3f} {-np.pi/2:.6f}\n"
                "DontCare -1 -1 -10 0 0 50 50 -1 -1 -1 -1000 -1000 -1000 -10"
            )
            calib = [
                "P2: " + " ".join(str(x) for x in np.eye(3, 4).ravel()),
                "R0_rect: " + " ".join(str(x) for x in np.eye(3).ravel()),
                "Tr_velo_to_cam: "
                + " ".join(str(x) for x in cam[:3].ravel()),
            ]
            (root / "training" / "calib" / f"{stem}.txt").write_text(
                "\n".join(calib)
            )
        (root / "ImageSets" / "train.txt").write_text("0\n1\n")
        (root / "ImageSets" / "val.txt").write_text("2\n")
        return root

    def test_convert_and_read(self, tmp_path):
        from liso_tpu.data.create_kitti_object import convert_split
        from liso_tpu.data.kitti import KittiObjectDataset

        root = self._make_object_root(tmp_path / "kitti_object")
        target = tmp_path / "conv" / "kitti_object_w_future_pcl"
        assert convert_split(root, None, target, "train") == 2
        assert convert_split(root, None, target, "val") == 1
        d = np.load(
            sorted((target / "val").glob("*.npy"))[0], allow_pickle=True
        ).item()
        assert d["pcl_t0"].shape[1] == 4
        assert len(d["objects_t0"]["poses"]) == 1  # DontCare dropped
        np.testing.assert_allclose(
            d["objects_t0"]["poses"][0, :3, 3], [10.0, 2.0, 0.0], atol=0.01
        )
        cfg = DataCfg(bev=BevSetup((60.0, 60.0), (64, 64)), n_max=4096,
                      m_max=8192)
        ds = KittiObjectDataset(cfg, tmp_path / "conv", split="val")
        s = ds[0]
        assert s.gt_boxes is not None and s.gt_boxes["valid"].sum() == 1
        np.testing.assert_allclose(
            s.gt_boxes["pos"][0], [10.0, 2.0, 0.0], atol=0.01
        )


class TestNuscenesCreate:
    """Devkit-free nuScenes ETL (liso_tpu/data/create_nuscenes vs reference
    liso/datasets/nuscenes/create.py): JSON-table parsing, 20 Hz sweep
    selection, interpolated instance poses -> GT flow, dataset reading."""

    def _make_mini_nusc(self, root, n_sweeps=9):
        """One scene, 20 Hz LIDAR_TOP chain, keyframes every 4th sweep,
        one car annotated at keyframes moving +2 m/s in x (vehicle frame
        = world frame here: stationary ego)."""
        import json as _json

        rng = np.random.RandomState(3)
        version = "v1.0-mini"
        tdir = root / version
        tdir.mkdir(parents=True)
        (root / "samples" / "LIDAR_TOP").mkdir(parents=True)
        t0 = 1_500_000_000_000_000
        dt = 50_000  # 20 Hz in us
        scene_tok, inst_tok = "scene0", "inst0"
        static = rng.uniform(-25, 25, (2500, 3)).astype(np.float32)
        static[:, 2] = rng.uniform(-1.8, 1.0, len(static))

        samples, sample_datas, ego_poses, anns = [], [], [], []
        key_sweeps = [i for i in range(n_sweeps) if i % 4 == 0]
        sweep_sample = {}
        for i in key_sweeps:
            samples.append({
                "token": f"samp{i}", "scene_token": scene_tok,
                "timestamp": t0 + i * dt,
                "data": {"LIDAR_TOP": f"sd{i}"},
                "anns": [f"ann{i}"],
                "prev": "", "next": "",
            })
            for j in range(i, min(i + 4, n_sweeps)):
                sweep_sample[j] = f"samp{i}"
        for i in range(n_sweeps):
            ts = t0 + i * dt
            car_x = 8.0 + 2.0 * (i * dt / 1e6)  # 2 m/s
            car = rng.uniform(-1.5, 1.5, (150, 3)).astype(np.float32)
            car[:, 1] *= 0.5
            car[:, 2] = car[:, 2] * 0.4 + 0.75
            car[:, 0] += car_x
            # pcd.bin stores SENSOR-frame points; sensor = vehicle here
            pcl = np.concatenate([static, car])
            raw = np.concatenate(
                [pcl, rng.rand(len(pcl), 1).astype(np.float32) * 100,
                 rng.randint(0, 32, (len(pcl), 1)).astype(np.float32)], -1,
            )
            fname = f"samples/LIDAR_TOP/sweep_{i}.pcd.bin"
            raw.astype(np.float32).tofile(root / fname)
            sample_datas.append({
                "token": f"sd{i}",
                "sample_token": sweep_sample[i],
                "ego_pose_token": f"ep{i}",
                "calibrated_sensor_token": "cs0",
                "timestamp": ts, "filename": fname,
                "prev": f"sd{i-1}" if i else "", "next": "",
            })
            ego_poses.append({
                "token": f"ep{i}", "timestamp": ts,
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "translation": [0.0, 0.0, 0.0],
            })
        for i in key_sweeps:
            ts = t0 + i * dt
            car_x = 8.0 + 2.0 * (i * dt / 1e6)
            anns.append({
                "token": f"ann{i}", "sample_token": f"samp{i}",
                "instance_token": inst_tok,
                "category_name": "vehicle.car",
                "translation": [car_x, 0.0, 0.75],
                "size": [1.8, 4.2, 1.6],  # w l h (nusc order)
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "prev": "", "next": "",
            })
        tables = {
            "scene": [{"token": scene_tok, "name": "scene-0001"}],
            "sample": samples,
            "sample_data": sample_datas,
            "ego_pose": ego_poses,
            "calibrated_sensor": [{
                "token": "cs0", "rotation": [1.0, 0.0, 0.0, 0.0],
                "translation": [0.0, 0.0, 0.0],
            }],
            "sample_annotation": anns,
            "instance": [{"token": inst_tok}],
            "category": [{"token": "cat0", "name": "vehicle.car"}],
        }
        for name, rows in tables.items():
            (tdir / f"{name}.json").write_text(_json.dumps(rows))
        return root

    def test_convert_and_flow(self, tmp_path):
        from liso_tpu.data.create_nuscenes import (
            KITTI_LIDAR_T_NUSC_VEHICLE,
            NuscTables,
            convert_sample,
        )

        root = self._make_mini_nusc(tmp_path / "nusc")
        tables = NuscTables(root, "v1.0-mini")
        out = tmp_path / "conv" / "nuscenes"
        results = [
            convert_sample(tables, s, out) for s in tables.sample
        ]
        assert results[0] == "fine", results
        files = sorted(out.glob("*.npy"))
        assert files, "no samples written"
        d = np.load(files[0], allow_pickle=True).item()
        for k in ("pcl_t0", "pcl_t1", "pcl_t2", "flow_t0_t1", "flow_t1_t0",
                  "flow_t0_t2", "flow_t2_t1", "is_ground_t0", "odom_t0_t1",
                  "kiss_odom_t0_t1", "objects", "lidar_rows_t0", "name"):
            assert k in d, k
        # t1 is +2 sweeps = 0.1 s (10 Hz pairing of the 20 Hz chain)
        assert d["pcl_t0"].shape[1] == 4
        # stationary ego -> odom identity
        np.testing.assert_allclose(d["odom_t0_t1"], np.eye(4), atol=1e-9)
        # car at 2 m/s: in-box GT flow ~0.2 m over 0.1 s, in kitti frame
        obj = d["objects"][0]
        # box pose is in the kitti-lidar frame (z shifted by -1.73)
        np.testing.assert_allclose(
            obj["pose_t0"][:3, 3],
            (KITTI_LIDAR_T_NUSC_VEHICLE @ np.array(
                [8.0, 0.0, 0.75, 1.0]))[:3],
            atol=1e-6,
        )
        in_box = d["track_ids_mask_t0"] == 0
        # ann_idx 0 is also the background fill value; select via flow
        moving = np.linalg.norm(d["flow_t0_t1"], axis=-1) > 0.15
        assert moving.sum() > 100
        np.testing.assert_allclose(
            d["flow_t0_t1"][moving].mean(0), [0.2, 0.0, 0.0], atol=0.02
        )
        np.testing.assert_allclose(
            np.linalg.norm(obj["box_velocity"][:2]), 2.0, atol=0.05
        )

    def test_dataset_reads_converted(self, tmp_path):
        from liso_tpu.data.create_nuscenes import NuscTables, convert_sample
        from liso_tpu.data.nuscenes import NuscenesDataset

        root = self._make_mini_nusc(tmp_path / "nusc")
        tables = NuscTables(root, "v1.0-mini")
        out = tmp_path / "conv" / "nuscenes"
        for s in tables.sample:
            convert_sample(tables, s, out)
        cfg = DataCfg(bev=BevSetup((60.0, 60.0), (64, 64)), n_max=4096,
                      m_max=8192, use_skip_frames="never")
        ds = NuscenesDataset(cfg, tmp_path / "conv")
        assert len(ds) >= 1
        s = ds[0]
        assert s.gt_boxes is not None and s.gt_boxes["valid"].sum() == 1
        # moving car flagged via box_velocity
        assert s.gt_boxes["velo"][0, 0] > 1.5
        # real object flow present in the loaded sample
        fl = s.flow_t0_t1[s.frame_t0.valid]
        assert np.linalg.norm(fl, axis=-1).max() > 0.15


class TestWaymoCreate:
    """Waymo ETL consuming the OpenPCDet waymo_processed_data layout
    (liso_tpu/data/create_waymo vs reference waymo_torch_dataset.py's
    lazy generation)."""

    def _make_processed(self, root, seq="segment-123", n_frames=4):
        import pickle as _pickle

        rng = np.random.RandomState(5)
        d = root / seq
        d.mkdir(parents=True)
        static = rng.uniform(-30, 30, (2000, 3)).astype(np.float32)
        static[:, 2] = rng.uniform(-0.1, 2.5, len(static))  # vehicle frame
        infos = []
        for i in range(n_frames):
            car_x = 10.0 + 1.5 * i  # 15 m/s at 10 Hz, vehicle frame
            car = rng.uniform(-2, 2, (150, 3)).astype(np.float32)
            car[:, 1] *= 0.5
            car[:, 2] = car[:, 2] * 0.35 + 0.8
            car[:, 0] += car_x
            pcl = np.concatenate([static, car])
            raw = np.concatenate(
                [pcl, rng.rand(len(pcl), 1).astype(np.float32),
                 np.zeros((len(pcl), 2), np.float32)], -1,
            )
            np.save(d / f"{i:04d}.npy", raw)
            infos.append({
                "point_cloud": {"lidar_sequence": seq, "sample_idx": i},
                "frame_id": f"{seq}_{i:03d}",
                "pose": np.eye(4),  # stationary ego
                "num_points_of_each_lidar": [len(pcl), 0, 0, 0, 0],
                "annos": {
                    "name": np.array(["Vehicle", "Sign"]),
                    "gt_boxes_lidar": np.array(
                        [[car_x, 0.0, 0.8, 4.5, 2.0, 1.6, 0.0],
                         [5.0, 5.0, 1.0, 0.5, 0.5, 2.0, 0.0]]
                    ),
                    "num_points_in_gt": np.array([150, 5]),
                    "difficulty": np.array([0, 0]),
                    "obj_ids": np.array(["car-1", "sign-1"]),
                    "speed_global": np.array([[15.0, 0.0], [0.0, 0.0]]),
                },
            })
        with open(d / f"{seq}.pkl", "wb") as f:
            _pickle.dump(infos, f)
        return root

    def test_convert_and_read(self, tmp_path):
        from liso_tpu.data.create_waymo import (
            WAYMO_LIDAR_T_VEHICLE,
            convert_sequence,
        )
        from liso_tpu.data.waymo import WaymoDataset

        root = self._make_processed(tmp_path / "processed")
        out = tmp_path / "conv" / "waymo"
        n = convert_sequence(
            root, root / "segment-123" / "segment-123.pkl", out
        )
        assert n == 2
        d = np.load(sorted(out.glob("*.npy"))[0], allow_pickle=True).item()
        # Sign box dropped, Vehicle kept; pos shifted to the lidar frame
        assert len(d["objects_t0"]["poses"]) == 1
        np.testing.assert_allclose(
            d["objects_t0"]["poses"][0, :3, 3],
            np.array([10.0, 0.0, 0.8]) + WAYMO_LIDAR_T_VEHICLE[:3, 3],
            atol=1e-6,
        )
        # GT flow: car points move 1.5 m/frame, statics ~0
        moving = np.linalg.norm(d["flow_t0_t1"], axis=-1) > 1.0
        assert moving.sum() > 100
        np.testing.assert_allclose(
            d["flow_t0_t1"][moving].mean(0), [1.5, 0, 0], atol=0.05
        )
        assert np.abs(d["flow_t0_t1"][~moving]).max() < 1e-3

        cfg = DataCfg(bev=BevSetup((80.0, 80.0), (64, 64)), n_max=4096,
                      m_max=8192, use_skip_frames="never",
                      pillar_height_range_m=(-3.5, 1.0),
                      ground_cone_z_threshold_m=-1.55)
        ds = WaymoDataset(cfg, tmp_path / "conv", downsample_factor=1)
        s = ds[0]
        assert s.gt_boxes is not None and s.gt_boxes["valid"].sum() == 1
        assert s.gt_boxes["velo"][0, 0] > 10.0  # speed_global norm
        assert "difficulty" in s.gt_boxes
