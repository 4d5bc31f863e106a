"""Checked-in mini ETL fixture (VERDICT r3 item 9): a byte-layout-faithful
synthetic KITTI raw drive — velodyne .bin (float32 Nx4), OXTS .txt packets
(30 whitespace fields), calib_imu_to_velo.txt — driven through the REAL
create_kitti ETL, loaded by KittiRawDataset, and pushed through one mining
step, so the ETL schema parity is tested rather than env-gated faith.
Byte layout per the reference's inputs (pykitti readers consumed by
liso/datasets/kitti/create_kitti_raw.py:39-177)."""
from pathlib import Path

import numpy as np
import pytest

from liso_tpu.data.create_kitti import main as create_kitti_main
from liso_tpu.data.dataset import DataCfg
from liso_tpu.data.kitti import KittiRawDataset
from liso_tpu.ops.bev import BevSetup

EARTH_RADIUS = 6378137.0
LAT0 = 49.011  # Karlsruhe-ish
N_FRAMES = 5
EGO_SPEED = 1.2  # m/frame along +x


def _oxts_line(tx: float, lat0: float = LAT0) -> str:
    """Inverse of create_kitti.oxts_to_pose's mercator for motion along x
    at constant latitude: lon = tx * 180 / (pi * R * cos(lat))."""
    scale = np.cos(lat0 * np.pi / 180.0)
    lon = tx * 180.0 / (np.pi * EARTH_RADIUS * scale)
    alt, roll, pitch, yaw = 112.8, 0.0, 0.0, 0.0
    head = [lat0, lon, alt, roll, pitch, yaw]
    # remaining 24 OXTS packet fields (velocities, accels, status flags)
    tail = [EGO_SPEED * 10.0, 0.0, 0.0] + [0.0] * 17 + [4, 4, 6, 6]
    return " ".join(f"{v:.12f}" for v in head + tail)


def _scene(t: int, rng: np.random.RandomState) -> np.ndarray:
    """Sensor-frame cloud at frame t: static world content seen from an
    ego at x = EGO_SPEED * t, plus a ground plane."""
    world = rng.uniform(-25, 25, (1200, 3)).astype(np.float32)
    world[:, 2] = np.abs(world[:, 2]) * 0.04 - 0.2  # structures above ground
    ground = rng.uniform(-25, 25, (800, 3)).astype(np.float32)
    ground[:, 2] = rng.uniform(-1.78, -1.70, 800)
    pts_w = np.concatenate([world, ground])
    pts_s = pts_w.copy()
    pts_s[:, 0] -= EGO_SPEED * t
    inten = rng.uniform(0, 1, (len(pts_s), 1)).astype(np.float32)
    return np.concatenate([pts_s, inten], axis=1).astype(np.float32)


def write_kitti_raw_fixture(root: Path) -> Path:
    """root/2011_09_26/2011_09_26_drive_0001_sync/{velodyne_points,oxts}."""
    date = root / "2011_09_26"
    drive = date / "2011_09_26_drive_0001_sync"
    (drive / "velodyne_points" / "data").mkdir(parents=True)
    (drive / "oxts" / "data").mkdir(parents=True)
    # identity-ish imu->velo calib (translation only, like the real file)
    (date / "calib_imu_to_velo.txt").write_text(
        "calib_time: 25-May-2012 16:47:16\n"
        "R: 1 0 0 0 1 0 0 0 1\n"
        "T: -0.8 0.3 0.8\n"
    )
    rng = np.random.RandomState(0)
    # one world realisation shared by all frames => exact rigid ego motion
    state = rng.get_state()
    for t in range(N_FRAMES):
        rng.set_state(state)
        pts = _scene(t, rng)
        pts.tofile(drive / "velodyne_points" / "data" / f"{t:010d}.bin")
        (drive / "oxts" / "data" / f"{t:010d}.txt").write_text(
            _oxts_line(EGO_SPEED * t) + "\n"
        )
    return root


@pytest.fixture(scope="module")
def etl_output(tmp_path_factory):
    raw = write_kitti_raw_fixture(tmp_path_factory.mktemp("kitti_raw_src"))
    target = tmp_path_factory.mktemp("kitti_etl_out")
    create_kitti_main(
        ["--kitti_raw_root", str(raw), "--target_dir", str(target),
         "--use_icp"]
    )
    return target


def test_etl_writes_reference_schema(etl_output):
    files = sorted((etl_output / "kitti_raw").glob("*.npy"))
    assert len(files) == N_FRAMES - 2  # t0/t1/t2 triples
    d = np.load(files[0], allow_pickle=True).item()
    for tk in ("t0", "t1", "t2"):
        assert d[f"pcl_{tk}"].dtype == np.float32
        assert d[f"pcl_{tk}"].shape[1] == 4
        assert d[f"is_ground_{tk}"].dtype == np.bool_
        assert len(d[f"is_ground_{tk}"]) == len(d[f"pcl_{tk}"])
    assert d["odom_t0_t1"].shape == (4, 4)
    assert d["name"] == "2011_09_26_drive_0001_0000000000"
    # GPS odometry reproduces the planted rigid ego motion: sensor moves
    # +EGO_SPEED x per frame => odom_t0_t1 translation = (+EGO_SPEED, 0, 0)
    np.testing.assert_allclose(
        d["odom_t0_t1"][:3, 3], [EGO_SPEED, 0.0, 0.0], atol=2e-3
    )
    np.testing.assert_allclose(
        d["odom_t0_t1"][:3, :3], np.eye(3), atol=1e-5
    )
    np.testing.assert_allclose(
        d["odom_t0_t2"][:3, 3], [2 * EGO_SPEED, 0.0, 0.0], atol=4e-3
    )
    # the ICP odometry (kiss_odom_* keys, reference create_kitti_raw
    # stores both) agrees with GPS within a few cm on this rigid drive
    np.testing.assert_allclose(
        d["kiss_odom_t0_t1"][:3, 3], [EGO_SPEED, 0.0, 0.0], atol=0.05
    )
    # most ground-plane points are labeled ground
    pcl = d["pcl_t0"]
    low = pcl[:, 2] < -1.6
    assert d["is_ground_t0"][low].mean() > 0.7


def test_etl_output_feeds_dataset_and_mining(etl_output):
    bev = BevSetup((40.0, 40.0), (64, 64))
    cfg = DataCfg(bev=bev, n_max=2048, m_max=4096, k_max_boxes=8,
                  use_skip_frames="never")
    ds = KittiRawDataset(cfg, etl_output)
    assert ds.num_sequences == 1
    s = ds[0]
    assert s.sample_id == "2011_09_26_drive_0001_0000000000"
    assert s.frame_t0.valid.any()
    # rigid scene: the GT-fallback flow equals the inverse ego motion
    v = s.frame_t0.valid
    flows = s.flow_t0_t1[v]
    np.testing.assert_allclose(
        flows.mean(axis=0), [-EGO_SPEED, 0.0, 0.0], atol=5e-3
    )

    # one full mining pass over the drive (bootstrap flow-cluster): a
    # static drive mines no boxes, but every frame gets a DB entry and
    # the tracker/DB machinery consumes the ETL format end to end
    import jax

    from liso_tpu.models.flow_cluster_detector import (
        FlowClusterCfg,
        detect_boxes_from_flow,
    )
    from liso_tpu.ops.bev import point_cell_ids
    from liso_tpu.tracker.mining import MiningCfg, mine_sequence
    from liso_tpu.train.liso_loop import frames_from_dataset

    frames = frames_from_dataset(
        ds, ds.get_consecutive_sample_idxs_for_sequence(0)
    )
    fc_cfg = FlowClusterCfg(min_residual_flow_thresh_mps=1.0, k_max=8)

    @jax.jit
    def detect(pcl, valid, flow, odom):
        import jax.numpy as jnp

        cell, _, _ = point_cell_ids(pcl[:, :2], bev, valid)
        return detect_boxes_from_flow(
            pcl, valid, cell, flow, odom, pcl, valid,
            jnp.asarray(0.1), bev, fc_cfg,
        )

    import jax.numpy as jnp

    result = mine_sequence(
        frames,
        lambda f: detect(
            jnp.asarray(f.pcl), jnp.asarray(f.valid),
            jnp.asarray(f.flow), jnp.asarray(f.odom_ta_tb, jnp.float32),
        ),
        MiningCfg(min_track_age=2, track_confidence_threshold=0.1,
                  min_points_in_box=5, box_matching_threshold_m=1.0,
                  is_flow_cluster_detector=True),
        bev,
    )
    assert set(result["mined_db"].keys()) == {f.sample_id for f in frames}
