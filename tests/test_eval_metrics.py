"""AP / flow metric tests with known-answer scenarios."""
import numpy as np

from liso_tpu.eval.flow_metrics import FlowMetrics
from liso_tpu.eval.od_metrics import ObjectDetectionMetrics, calc_ap


def mk(pos, probs=None, velo=None, rot=None, dims=None):
    pos = np.asarray(pos, np.float32).reshape(-1, 3)
    k = len(pos)
    return {
        "pos": pos,
        "dims": np.tile([[4.0, 2.0, 1.5]], (k, 1)).astype(np.float32)
        if dims is None
        else np.asarray(dims, np.float32),
        "rot": np.zeros((k, 1), np.float32)
        if rot is None
        else np.asarray(rot, np.float32).reshape(-1, 1),
        "probs": np.ones((k, 1), np.float32)
        if probs is None
        else np.asarray(probs, np.float32).reshape(-1, 1),
        "velo": np.zeros((k, 1), np.float32)
        if velo is None
        else np.asarray(velo, np.float32).reshape(-1, 1),
    }


def test_perfect_detection_gives_ap_one():
    m = ObjectDetectionMetrics(min_recall=0.0, min_precision=0.0)
    for _ in range(5):
        gt = mk([[0, 0, 0], [10, 5, 0]])
        m.update(gt, gt)
    out = m.compute()
    assert abs(out["AP_overall_overall_dist@2.0"] - 1.0) < 0.02, out
    assert out["ATE_overall"] < 1e-6
    assert out["AOE_overall"] < 1e-6


def test_no_detections_gives_ap_zero():
    m = ObjectDetectionMetrics(min_recall=0.0, min_precision=0.0)
    m.update(mk([[0, 0, 0]]), mk(np.zeros((0, 3))))
    out = m.compute()
    assert out["AP_overall_overall_dist@2.0"] == 0.0


def test_false_positives_reduce_ap():
    m = ObjectDetectionMetrics(min_recall=0.0, min_precision=0.0)
    gt = mk([[0, 0, 0]])
    # 1 TP at conf 0.9 + 3 FPs at higher conf
    pred = mk(
        [[0.1, 0, 0], [50, 0, 0], [60, 0, 0], [70, 0, 0]],
        probs=[0.9, 0.95, 0.96, 0.97],
    )
    m.update(gt, pred)
    out = m.compute()
    ap = out["AP_overall_overall_dist@2.0"]
    assert 0.0 < ap < 0.5, ap


def test_moving_still_split():
    m = ObjectDetectionMetrics(
        moving_velocity_thresh=0.5, min_recall=0.0, min_precision=0.0
    )
    gt = mk([[0, 0, 0], [10, 0, 0]], velo=[3.0, 0.0])
    pred = mk([[0, 0, 0]], probs=[0.9])  # only detects the moving one
    m.update(gt, pred)
    out = m.compute()
    assert out["AP_overall_moving_dist@2.0"] > 0.9
    assert out["AP_overall_still_dist@2.0"] == 0.0


def test_iou_matching_criterion():
    m = ObjectDetectionMetrics(
        box_matching_criterion="iou_bev", min_recall=0.0, min_precision=0.0
    )
    gt = mk([[0, 0, 0]])
    good = mk([[0.2, 0.1, 0]], probs=[0.9])  # high overlap
    m.update(gt, good)
    out = m.compute()
    assert out["AP_overall_overall_iou_bev@0.5"] > 0.9, out


def test_calc_ap_clipping():
    # constant precision 1.0 -> AP 1 regardless of clipping
    assert abs(calc_ap(np.ones(101), 0.1, 0.1) - 1.0) < 1e-6
    # zero precision -> 0
    assert calc_ap(np.zeros(101), 0.1, 0.1) == 0.0


def test_flow_metrics_epe():
    fm = FlowMetrics()
    n = 1000
    rng = np.random.RandomState(0)
    pts = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    gt = np.zeros((n, 3), np.float32)
    gt[: n // 2, 0] = 2.0  # moving half
    pred = gt + 0.05
    moving = np.zeros(n, bool)
    moving[: n // 2] = True
    fm.update(pts, pred, gt, moving, np.ones(n, bool))
    out = fm.compute()
    assert abs(out["AEE_overall"] - 0.05 * np.sqrt(3)) < 0.01
    assert out["AccR_overall"] > 0.99  # 0.087 < 0.1
    assert out["Outliers_overall"] < 0.01
    assert abs(out["AEE_moving"] - out["AEE_still"]) < 0.01


def test_pr_curves_exposed():
    """od_metrics.py:547-1396 TB curve parity: the bank exposes interpolated
    PR arrays per (class, threshold, category)."""
    from liso_tpu.eval.od_metrics import ObjectDetectionMetrics

    bank = ObjectDetectionMetrics(box_matching_criterion="dist")
    gt = {
        "pos": np.array([[0.0, 0, 0], [10.0, 0, 0]], np.float32),
        "dims": np.ones((2, 3), np.float32) * 2,
        "rot": np.zeros((2, 1), np.float32),
        "probs": np.ones((2, 1), np.float32),
        "velo": np.zeros((2, 1), np.float32),
    }
    pred = {k: v.copy() for k, v in gt.items()}
    pred["probs"] = np.array([[0.9], [0.7]], np.float32)
    bank.update(gt, pred)
    curves = bank.curves()
    assert curves
    any_curve = next(iter(curves.values()))
    assert any_curve["recall"].shape == (101,)
    assert any_curve["precision"].shape == (101,)
    # perfect detections: precision 1 up to full recall
    assert any_curve["precision"][:50].max() > 0.99


def test_kitti_annotated_fov_counting():
    """eval_ours.count_box_points_in_kitti_annotated_fov:97-117: points
    behind the camera (outside the opening angle) never count."""
    from liso_tpu.eval.run_val import count_box_points_in_kitti_annotated_fov

    boxes = {
        "pos": np.array([[5.0, 0, 0], [-5.0, 0, 0]], np.float32),
        "dims": np.ones((2, 3), np.float32) * 2,
        "rot": np.zeros((2, 1), np.float32),
    }
    pts_front = np.tile(np.array([[5.0, 0, 0, 1]], np.float32), (20, 1))
    pts_back = np.tile(np.array([[-5.0, 0, 0, 1]], np.float32), (20, 1))
    counts = count_box_points_in_kitti_annotated_fov(
        boxes, np.concatenate([pts_front, pts_back])
    )
    assert counts[0] == 20  # in front, inside FoV
    assert counts[1] == 0  # behind the camera: filtered by opening angle
