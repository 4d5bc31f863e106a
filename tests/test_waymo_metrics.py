"""Waymo-style metric tests (recall-gap AP)."""
import numpy as np

from liso_tpu.eval.waymo_metrics import WaymoObjectDetectionMetrics, waymo_ap
from tests.test_eval_metrics import mk


def test_waymo_ap_penalizes_recall_gaps():
    # perfect precision but only 50% recall -> conservative points pull AP
    # towards ~0.5
    ap = waymo_ap(np.array([1.0, 1.0]), np.array([0.25, 0.5]))
    assert 0.2 < ap < 0.6, ap
    # full recall at precision 1 -> AP 1
    ap_full = waymo_ap(np.ones(20), np.linspace(0.05, 1.0, 20))
    assert ap_full > 0.99


def test_waymo_metrics_perfect():
    m = WaymoObjectDetectionMetrics()
    gt = mk([[0, 0, 0], [10, 5, 0]])
    for _ in range(3):
        m.update(gt, gt)
    out = m.compute()
    # L1/L2 difficulty categories (od_metrics.py:1533-1562); no difficulty
    # labels here -> both identical
    assert out["waymo/AP_L2_iou_bev@0.4"] > 0.95
    assert out["waymo/AP_L2_iou_3d@0.4"] > 0.95
    assert out["waymo/AP_L1_iou_bev@0.4"] > 0.95


def test_waymo_fov_crop():
    m = WaymoObjectDetectionMetrics()
    # gt outside the [-50,50]x[-20,20] crop is ignored entirely
    gt = mk([[0, 30.0, 0]])
    pred = mk(np.zeros((0, 3)))
    m.update(gt, pred)
    out = m.compute()
    assert out == {} or all(v == 0.0 for v in out.values())
