"""Tracker association + track smoothing tests."""
import numpy as np
import jax.numpy as jnp

from liso_tpu.tracker.matching import greedy_match_by_confidence
from liso_tpu.tracker.smoothing import smooth_track_jerk
from liso_tpu.tracker.tracker import (
    FlowBasedBoxTracker,
    NotATracker,
    box_poses,
    empty_boxes,
)


def mk_boxes(pos, probs=None):
    pos = np.asarray(pos, np.float32).reshape(-1, 3)
    k = len(pos)
    return {
        "pos": pos,
        "dims": np.tile(np.array([[4.0, 2.0, 1.5]], np.float32), (k, 1)),
        "rot": np.zeros((k, 1), np.float32),
        "probs": np.ones((k, 1), np.float32)
        if probs is None
        else np.asarray(probs, np.float32).reshape(-1, 1),
        "velo": np.zeros((k, 1), np.float32),
    }


def test_greedy_match_prefers_confident_preds():
    gt = np.array([[0.0, 0.0, 0.0]])
    preds = np.array([[0.2, 0.0, 0.0], [0.1, 0.0, 0.0]])
    conf = np.array([0.9, 0.5])
    m = greedy_match_by_confidence(gt, preds, conf, 1.0)
    # higher-confidence pred 0 claims the gt even though pred 1 is closer
    assert m.idxs_pred.tolist() == [0]
    assert m.matched_preds_mask.tolist() == [True, False]


def test_greedy_match_threshold():
    m = greedy_match_by_confidence(
        np.array([[0.0, 0.0, 0.0]]), np.array([[5.0, 0.0, 0.0]]),
        np.array([1.0]), 1.0,
    )
    assert len(m.idxs_pred) == 0


def test_tracker_links_moving_object():
    """Object moves +1m/frame in x; ego stationary; 6 frames."""
    tracker = FlowBasedBoxTracker(box_matching_threshold_m=1.5)
    eye = np.eye(4)
    for t in range(6):
        boxes = mk_boxes([[float(t), 0.0, 0.0]])
        poses = box_poses(boxes)
        # flow propagation: into past = pos - velocity, into future = pos + v
        past = poses.copy()
        past[:, 0, 3] -= 1.0
        fut = poses.copy()
        fut[:, 0, 3] += 1.0
        tracker.update(boxes, fut, past, eye)
    tracker.run_tracker()
    ids, ages = tracker.get_track_ids_and_ages()
    flat_ids = np.concatenate(ids)
    assert len(np.unique(flat_ids)) == 1, flat_ids  # one track
    assert max(np.concatenate(ages)) >= 5


def test_tracker_separate_tracks_for_distant_objects():
    tracker = FlowBasedBoxTracker(box_matching_threshold_m=1.0)
    eye = np.eye(4)
    for t in range(4):
        boxes = mk_boxes([[float(t), 0.0, 0.0], [20.0 - t, 10.0, 0.0]])
        poses = box_poses(boxes)
        past = poses.copy()
        past[0, 0, 3] -= 1.0
        past[1, 0, 3] += 1.0
        fut = poses.copy()
        fut[0, 0, 3] += 1.0
        fut[1, 0, 3] -= 1.0
        tracker.update(boxes, fut, past, eye)
    tracker.run_tracker()
    ids, ages = tracker.get_track_ids_and_ages()
    assert len(np.unique(np.concatenate(ids))) == 2
    assert (np.concatenate(ages) >= 3).all()


def test_tracker_hole_filling():
    """Miss the detection in frame 2 of 5 -> hole filled by coasted box."""
    tracker = FlowBasedBoxTracker(box_matching_threshold_m=2.0)
    eye = np.eye(4)
    for t in range(5):
        if t == 2:
            boxes = empty_boxes()
        else:
            boxes = mk_boxes([[float(t), 0.0, 0.0]])
        poses = box_poses(boxes)
        past = poses.copy()
        fut = poses.copy()
        if len(poses):
            past[:, 0, 3] -= 1.0
            fut[:, 0, 3] += 1.0
        tracker.update(boxes, fut, past, eye)
    tracker.run_tracker()
    ids, _ = tracker.get_track_ids_and_ages()
    # frame 2 got a filled box with the same track id
    assert len(ids[2]) == 1
    assert ids[2][0] == ids[1][0]
    filled_pos = tracker.boxes_world[2]["pos"][0]
    assert abs(filled_pos[0] - 2.0) < 1.5, filled_pos


def test_tracker_ego_motion_compensation():
    """Static object, ego moves +1m/frame: world-frame track is stationary
    so association succeeds with a tight threshold."""
    tracker = FlowBasedBoxTracker(box_matching_threshold_m=0.5)
    odom = np.eye(4)
    odom[0, 3] = 1.0  # s(t)_T_s(t+1); object at x=5-t in sensor frame
    inv_odom = np.linalg.inv(odom)
    for t in range(4):
        boxes = mk_boxes([[5.0 - t, 0.0, 0.0]])
        poses = box_poses(boxes)
        # static object: propagation into past/future frames is pure ego
        # motion (mining derives this from the Kabsch background trafo)
        past = odom[None] @ poses  # pose in s(t-1) coords
        fut = inv_odom[None] @ poses  # pose in s(t+1) coords
        tracker.update(boxes, fut, past, odom)
    tracker.run_tracker()
    ids, ages = tracker.get_track_ids_and_ages()
    assert len(np.unique(np.concatenate(ids))) == 1
    assert max(np.concatenate(ages)) >= 3


def test_not_a_tracker_passthrough():
    nt = NotATracker()
    nt.update(mk_boxes([[1.0, 0.0, 0.0]]), odom=np.eye(4))
    nt.update(mk_boxes([[2.0, 0.0, 0.0]]), odom=np.eye(4))
    nt.run_tracker()
    ids, ages = nt.get_track_ids_and_ages()
    assert len(np.unique(np.concatenate(ids))) == 2  # no association
    assert (np.concatenate(ages) > 100).all()


def test_smooth_track_jerk_denoises():
    rng = np.random.RandomState(0)
    t = 20
    clean = np.stack(
        [np.linspace(0, 19, t), np.zeros(t), np.zeros(t)], axis=-1
    )[None]
    noisy = clean + rng.randn(1, t, 3) * 0.3
    valid = jnp.ones((1, t), bool)
    yaw = jnp.zeros((1, t, 1))
    pos, rot, velo = smooth_track_jerk(
        jnp.asarray(noisy, jnp.float32), valid, yaw, max_iters=400
    )
    err_noisy = np.abs(np.asarray(noisy) - clean).mean()
    err_smooth = np.abs(np.asarray(pos) - clean).mean()
    assert err_smooth < err_noisy * 0.8, (err_noisy, err_smooth)
    # velocity ~ 1 m/frame, yaw aligned to +x (0 rad)
    assert abs(float(velo[0, t // 2, 0]) - 1.0) < 0.3
    assert abs(float(rot[0, t // 2, 0])) < 0.3


def test_smooth_short_track_passthrough():
    pos = jnp.asarray(np.random.randn(2, 3, 3), jnp.float32)
    valid = jnp.ones((2, 3), bool)
    yaw = jnp.zeros((2, 3, 1))
    p, r, v = smooth_track_jerk(pos, valid, yaw, max_iters=10)
    assert np.allclose(np.asarray(p), np.asarray(pos))


class TestBikeModelSmoothing:
    """Reference liso/tracker/track_smoothing.py:300-741
    (smooth_track_bike_model / BatchedBikeModel / car_dynamics)."""

    def _noisy_track(self, T=20, step=2.0, noise=0.3):
        rng = np.random.RandomState(0)
        pos = np.stack([np.arange(T) * step, np.zeros(T), np.zeros(T)], -1)
        noisy = pos + rng.randn(T, 3) * np.array([noise, noise, 0.0])
        return pos, noisy

    def test_contract(self):
        from liso_tpu.tracker.smoothing import smooth_track_bike_model

        pos, noisy = self._noisy_track()
        T = len(pos)
        p, y, v = smooth_track_bike_model(
            jnp.asarray(noisy[None], jnp.float32),
            jnp.ones((1, T), bool),
            jnp.zeros((1, T, 1), jnp.float32),
            jnp.asarray([4.0], jnp.float32),
            max_iters=300,
        )
        p, y, v = np.asarray(p), np.asarray(y), np.asarray(v)
        assert np.isfinite(p).all() and np.isfinite(y).all()
        assert (v >= 0).all()  # kinematic model cannot reverse
        # tracks the observations to within ~1.5 m
        assert np.abs(p[0, :, :2] - noisy[:, :2]).mean() < 1.5
        # smoother than the raw observations (third-difference magnitude)
        jerk = lambda x: np.abs(np.diff(x, n=3, axis=0)).mean()
        assert jerk(p[0, :, :2]) < jerk(noisy[:, :2])
        # z is passed through unchanged
        np.testing.assert_allclose(p[0, :, 2], noisy[:, 2], atol=1e-6)

    def test_short_track_passthrough(self):
        from liso_tpu.tracker.smoothing import smooth_track_bike_model

        pos = np.zeros((1, 3, 3), np.float32)
        p, y, v = smooth_track_bike_model(
            jnp.asarray(pos), jnp.ones((1, 3), bool),
            jnp.zeros((1, 3, 1), jnp.float32), jnp.asarray([4.0], jnp.float32),
        )
        np.testing.assert_allclose(p, pos)
