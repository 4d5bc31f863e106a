"""End-to-end mining tests: sequence -> flow-cluster detect -> track ->
refine -> smooth -> DBs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from liso_tpu.models.flow_cluster_detector import (
    FlowClusterCfg,
    detect_boxes_from_flow,
)
from liso_tpu.ops.bev import BevSetup, point_cell_ids
from liso_tpu.tracker.box_fitting import fit_2d_box
from liso_tpu.tracker.dbs import (
    load_augm_db,
    load_mined_boxes_db,
    save_augm_db,
    save_mined_boxes_db,
)
from liso_tpu.tracker.mining import Frame, MiningCfg, mine_sequence

BEV = BevSetup(bev_range_m=(40.0, 40.0), grid_size=(128, 128))


def test_fit_2d_box_closeness_recovers_rectangle():
    rng = np.random.RandomState(0)
    yaw = 0.4
    c, s = np.cos(yaw), np.sin(yaw)
    # points on the edges of a 4x2 rectangle
    n = 200
    t = rng.uniform(-1, 1, n)
    side = rng.randint(0, 4, n)
    x = np.where(side == 0, 2.0, np.where(side == 1, -2.0, t * 2.0))
    y = np.where(side < 2, t * 1.0, np.where(side == 2, 1.0, -1.0))
    pts = np.stack([c * x - s * y + 5.0, s * x + c * y - 3.0], -1)
    center, length, width, angle = fit_2d_box(
        jnp.asarray(pts, jnp.float32), jnp.ones((n,), bool),
        method="closeness_to_edge",
    )
    assert np.allclose(np.asarray(center), [5.0, -3.0], atol=0.15)
    assert abs(float(length) - 4.0) < 0.3
    assert abs(float(width) - 2.0) < 0.3
    # angle modulo pi matches yaw
    d = abs((float(angle) - yaw + np.pi / 2) % np.pi - np.pi / 2)
    assert d < 0.1, (float(angle), yaw)


def make_sequence(n_frames=8, n=4096, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    for t in range(n_frames):
        bg = rng.uniform(-18, 18, (n - 512, 3)).astype(np.float32)
        bg[:, 2] = rng.uniform(-1.6, 0.2, len(bg))
        cx = -6.0 + 1.5 * t
        obj = rng.uniform(-1, 1, (512, 3)).astype(np.float32) * [
            2.0, 1.0, 0.6,
        ] + [cx, 2.0, -0.7]
        pcl = np.concatenate([bg, obj]).astype(np.float32)
        inten = rng.rand(n, 1).astype(np.float32)
        pcl4 = np.concatenate([pcl, inten], axis=-1)
        flow = np.zeros((n, 3), np.float32)
        flow[-512:, 0] = 1.5
        frames.append(
            Frame(
                sample_id=f"seq0_{t:04d}",
                pcl=pcl4,
                valid=np.ones(n, bool),
                flow=flow,
                odom_ta_tb=np.eye(4),
                lidar_rows=rng.randint(0, 64, n),
            )
        )
    return frames


def flow_cluster_detect(frame: Frame):
    pcl = jnp.asarray(frame.pcl)
    valid = jnp.asarray(frame.valid)
    cell, _, _ = point_cell_ids(pcl[:, :2], BEV, valid)
    return detect_boxes_from_flow(
        pcl, valid, cell, jnp.asarray(frame.flow),
        jnp.asarray(frame.odom_ta_tb, jnp.float32), pcl, valid,
        jnp.asarray(0.1), BEV, FlowClusterCfg(),
    )


def test_mine_sequence_end_to_end(tmp_path):
    frames = make_sequence()
    cfg = MiningCfg(min_points_in_box=20, smoothing_iters=200)
    result = mine_sequence(frames, flow_cluster_detect, cfg, BEV)
    assert result["num_tracks"] == 1, result["num_tracks"]
    mined = result["mined_db"]
    # every frame got a box (hole filling + full track)
    n_with_boxes = sum(1 for v in mined.values() if len(v["track_id"]))
    assert n_with_boxes >= 6
    for sid, entry in mined.items():
        if not len(entry["track_id"]):
            continue
        t = int(sid.split("_")[1])
        pos = entry["raw_box"]["pos"][0]
        assert abs(pos[0] - (-6.0 + 1.5 * t)) < 1.0, (sid, pos)
        assert abs(pos[1] - 2.0) < 1.0
        assert entry["lidar_T_box"].shape == (1, 4, 4)

    # augmentation snippets exist and are in box coords (centered)
    augm = result["augm_db"]
    assert len(augm["pcl_in_box_cosy"]) >= 6
    snip = augm["pcl_in_box_cosy"][0]
    assert snip.shape[-1] == 4
    assert np.abs(snip[:, :2]).max() < 3.0  # box-local coords

    # round-trip the DB files
    p1 = save_mined_boxes_db(mined, tmp_path / "tracked")
    loaded = load_mined_boxes_db(p1)
    assert set(loaded.keys()) == set(mined.keys())
    p2 = save_augm_db(augm, tmp_path / "augm_db")
    loaded_augm = load_augm_db(p2, confidence_threshold=0.0)
    assert len(loaded_augm["pcl_in_box_cosy"]) >= 6
    assert loaded_augm["boxes"]["pos"].shape[-1] == 3


def test_mine_sequence_no_tracks_for_short_sequence():
    frames = make_sequence(n_frames=2)
    cfg = MiningCfg(min_track_age=4, smoothing_iters=50)
    result = mine_sequence(frames, flow_cluster_detect, cfg, BEV)
    assert result["num_tracks"] == 0
    assert all(len(v["track_id"]) == 0 for v in result["mined_db"].values())


def test_mining_timeout_watchdog():
    """Watchdog aborts frame ingestion gracefully (tracking.py:533-557)."""
    frames = make_sequence(n_frames=8)
    cfg = MiningCfg(min_points_in_box=20, smoothing_iters=50,
                    timeout_s=1e-9)  # fires immediately after frame 1
    result = mine_sequence(frames, flow_cluster_detect, cfg, BEV)
    # no crash; few/no tracks; all sample ids present in the mined db
    assert set(result["mined_db"].keys()) == {f.sample_id for f in frames}


def test_build_augm_db_from_groundtruth():
    """datasets/create_gt_augm_database.py:38: GT boxes with enough points
    become copy-paste snippets in box coordinates."""
    from liso_tpu.tracker.dbs import build_augm_db_from_groundtruth

    rng = np.random.RandomState(0)
    pts_in = rng.uniform(-0.8, 0.8, (30, 3)) * np.array([2.0, 1.0, 0.7])
    pts_in = pts_in + np.array([6.0, 3.0, 0.0])
    clutter = rng.uniform(-20, 20, (100, 3))
    pcl = np.concatenate(
        [np.concatenate([pts_in, clutter]), np.ones((130, 1))], axis=1
    ).astype(np.float32)
    gt = {
        "pos": np.array([[6.0, 3.0, 0.0], [50.0, 50.0, 0.0]], np.float32),
        "dims": np.array([[4.2, 2.1, 1.6], [4.0, 2.0, 1.5]], np.float32),
        "rot": np.zeros((2, 1), np.float32),
        "probs": np.ones((2, 1), np.float32),
        "velo": np.zeros((2, 1), np.float32),
        "valid": np.array([True, True]),
    }
    db = build_augm_db_from_groundtruth(
        [{"pcl": pcl, "gt_boxes": gt}], min_num_points_in_box=5
    )
    # box 2 is empty -> only box 1 makes it in
    assert len(db["pcl_in_box_cosy"]) == 1
    snip = db["pcl_in_box_cosy"][0]
    assert len(snip) >= 30  # all planted points captured
    # snippet is in box coords: centered, inside half-dims
    assert np.abs(snip[:, :3]).max() <= 2.2
    assert db["boxes"]["pos"].shape == (1, 3)


def test_union_proposals_dedups_by_center_distance():
    from liso_tpu.ops.boxes import Boxes
    from liso_tpu.tracker.mining import union_proposals

    prim = Boxes.empty(3)
    prim = prim.replace(
        pos=jnp.asarray(
            [[0.0, 0.0, 0.0], [10.0, 0.0, 0.0], [99.0, 99.0, 0.0]]
        ),
        probs=jnp.asarray([[0.9], [0.8], [0.0]]),
        valid=jnp.asarray([True, True, False]),  # 3rd is invalid filler
    )
    sec = Boxes.empty(3)
    sec = sec.replace(
        pos=jnp.asarray(
            # dup of prim[0] | new object | near INVALID prim[2] (kept)
            [[0.4, 0.3, 0.0], [20.0, 5.0, 0.0], [99.2, 99.0, 0.0]]
        ),
        probs=jnp.asarray([[0.5], [0.5], [0.5]]),
        valid=jnp.asarray([True, True, True]),
    )
    out = union_proposals(prim, sec, 1.0)
    assert out.pos.shape == (6, 3)
    np.testing.assert_array_equal(
        np.asarray(out.valid), [True, True, False, False, True, True]
    )
    # primary fields come first and untouched
    np.testing.assert_allclose(np.asarray(out.pos[:3]), np.asarray(prim.pos))
    np.testing.assert_allclose(
        np.asarray(out.probs[3:]), np.asarray(sec.probs)
    )
