"""nuScenes-protocol detection metrics.

Behavioral reference: liso/eval/nuscenes_metrics_wrapper.py:22-441, which
converts Shape boxes to devkit DetectionBoxes (quaternions via pytorch3d)
and runs the official devkit DetectionMetrics. The official devkit is not
vendored here; this wrapper reproduces the protocol:

  * per-class max-range filtering (class_range: movable 50 m, or the
    per-class table of nuscenes_metrics_wrapper.py:88-99);
  * AP at center-distance thresholds {0.5, 1, 2, 4} m with the nuScenes
    greedy-by-confidence matcher, min_recall/min_precision 0.1;
  * ALL FIVE TP errors at dist_th_tp=2 m: mATE (m), mASE (1 - scale IoU),
    mAOE (rad), mAVE (m/s velocity L2), mAAE (1 - attribute accuracy;
    1.0 when no attribute labels exist, matching the devkit's nan->worst
    convention for classes without attributes);
  * NDS = (mean_ap_weight * mAP + sum(1 - min(1, err))) /
    (mean_ap_weight + 5) with mean_ap_weight = 5
    (nuscenes_metrics_wrapper.py:107-115 custom config);
  * devkit-format submission JSON export (`to_devkit_json`) so the
    official tooling can verify the numbers independently.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from liso_tpu.eval.od_metrics import ObjectDetectionMetrics
from liso_tpu.ops.transforms import matrix_to_quaternion  # devkit-compat
from liso_tpu.tracker.matching import greedy_match_by_confidence

# nuscenes_metrics_wrapper.py:88-99 (traffic_cone / barrier excluded)
NUSC_CLASS_RANGES = {
    "car": 50.0,
    "truck": 50.0,
    "bus": 50.0,
    "trailer": 50.0,
    "construction_vehicle": 50.0,
    "pedestrian": 40.0,
    "motorcycle": 40.0,
    "bicycle": 40.0,
}
MEAN_AP_WEIGHT = 5.0  # custom_movable_only_eval_config["mean_ap_weight"]
DIST_THS = (0.5, 1.0, 2.0, 4.0)
DIST_TH_TP = 2.0


def _yaw_to_quat_wxyz(yaw: np.ndarray) -> np.ndarray:
    """Devkit rotation field: unit quaternion of the box pose (wxyz)."""
    rot = np.zeros((len(yaw), 3, 3), np.float64)
    c, s = np.cos(yaw), np.sin(yaw)
    rot[:, 0, 0], rot[:, 0, 1] = c, -s
    rot[:, 1, 0], rot[:, 1, 1] = s, c
    rot[:, 2, 2] = 1.0
    return np.asarray(matrix_to_quaternion(rot))


class NuscenesObjectDetectionMetrics:
    """update(gt, pred, sample_token=...) with valid-only box dicts;
    compute() -> protocol numbers; to_devkit_json(path) -> submission
    file for the official evaluator."""

    def __init__(
        self,
        moving_velocity_thresh: float = 0.1,
        eval_movable_classes_as_one: bool = True,
        class_names: Optional[List[str]] = None,
    ):
        self.eval_movable_classes_as_one = eval_movable_classes_as_one
        if eval_movable_classes_as_one:
            self.class_ranges = {"movable": 50.0}
            bank_classes, bank_idxs = ("overall",), (0,)
        else:
            names = class_names or list(NUSC_CLASS_RANGES)
            self.class_ranges = {
                n: NUSC_CLASS_RANGES.get(n, 50.0) for n in names
            }
            bank_classes = tuple(names)
            bank_idxs = tuple(range(len(names)))
        self.bank_class_names = bank_classes
        self.bank = ObjectDetectionMetrics(
            moving_velocity_thresh=moving_velocity_thresh,
            box_matching_criterion="dist",
            use_slow_nuscenes_matching=True,
            min_recall=0.1,
            min_precision=0.1,
            class_names=bank_classes,
            class_idxs=bank_idxs,
        )
        # velocity / attribute TP errors accumulated at dist_th_tp
        self.ave_sum, self.aae_sum, self.tp_count = 0.0, 0.0, 0
        self.has_attributes = False
        self._results: Dict[str, list] = {}

    # ------------------------------------------------------------------
    def _range_filter(self, b: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Per-class max-distance filter (filter_boxes_by_dist)."""
        if len(b["pos"]) == 0:
            return b
        dist = np.linalg.norm(b["pos"][:, :2], axis=-1)
        if self.eval_movable_classes_as_one or "class_id" not in b:
            max_d = self.class_ranges[next(iter(self.class_ranges))]
            keep = dist <= max_d
        else:
            ranges = np.asarray(list(self.class_ranges.values()))
            cid = np.clip(
                b["class_id"][:, 0].astype(np.int64), 0, len(ranges) - 1
            )
            keep = dist <= ranges[cid]
        return {k: v[keep] for k, v in b.items()}

    def update(
        self,
        gt: Dict[str, np.ndarray],
        pred: Dict[str, np.ndarray],
        sample_token: str = "",
        iou_cache=None,  # accepted for uniform bank API; dist matching
    ):
        gt = self._range_filter(gt)
        pred = self._range_filter(pred)
        self.bank.update(gt, pred)
        # velocity + attribute errors over TPs at the TP threshold
        m = greedy_match_by_confidence(
            gt["pos"], pred["pos"], pred["probs"][:, 0], DIST_TH_TP,
            match_in_nd=2,
        )
        if len(m.idxs_gt):
            gv = self._velo_xy(gt, m.idxs_gt)
            pv = self._velo_xy(pred, m.idxs_pred)
            self.ave_sum += float(
                np.linalg.norm(gv - pv, axis=-1).sum()
            )
            if "attribute_id" in gt and "attribute_id" in pred:
                self.has_attributes = True
                ga = gt["attribute_id"][m.idxs_gt, 0]
                pa = pred["attribute_id"][m.idxs_pred, 0]
                self.aae_sum += float(np.count_nonzero(ga != pa))
            self.tp_count += len(m.idxs_gt)
        if sample_token:
            self._record(pred, sample_token)

    @staticmethod
    def _velo_xy(b: Dict[str, np.ndarray], idx) -> np.ndarray:
        v = b.get("velo")
        if v is None:
            return np.zeros((len(idx), 2))
        v = np.asarray(v)[idx]
        if v.shape[-1] >= 2:
            return v[:, :2]
        # scalar speed along the box heading
        yaw = np.asarray(b["rot"])[idx, 0]
        return v[:, 0:1] * np.stack([np.cos(yaw), np.sin(yaw)], -1)

    def _record(self, pred: Dict[str, np.ndarray], token: str):
        """Accumulate devkit-submission entries
        (nuscenes_metrics_wrapper.translate_our_box_to_nusc_box)."""
        k = len(pred["pos"])
        quats = _yaw_to_quat_wxyz(pred["rot"][:, 0]) if k else np.zeros((0, 4))
        entries = []
        for i in range(k):
            if self.eval_movable_classes_as_one or "class_id" not in pred:
                name = "movable"
            else:
                names = list(self.class_ranges)
                ci = int(pred["class_id"][i, 0])
                name = names[ci] if 0 <= ci < len(names) else names[0]
            vel = self._velo_xy(pred, np.asarray([i]))[0]
            entries.append(
                {
                    "sample_token": token,
                    "translation": [float(x) for x in pred["pos"][i]],
                    "size": [float(x) for x in pred["dims"][i]],
                    "rotation": [float(x) for x in quats[i]],
                    "velocity": [float(vel[0]), float(vel[1])],
                    "detection_name": name,
                    "detection_score": float(pred["probs"][i, 0]),
                    "attribute_name": "",
                }
            )
        self._results[token] = entries

    def to_devkit_json(self, path) -> Path:
        """Official nuScenes submission format
        ({"meta": ..., "results": {token: [...]}}), verifiable with the
        devkit's DetectionEval."""
        path = Path(path)
        payload = {
            "meta": {
                "use_camera": False,
                "use_lidar": True,
                "use_radar": False,
                "use_map": False,
                "use_external": False,
            },
            "results": self._results,
        }
        path.write_text(json.dumps(payload))
        return path

    # ------------------------------------------------------------------
    def compute(self) -> Dict[str, float]:
        out = self.bank.compute()
        per_class_ap: Dict[str, float] = {}
        for cn in self.bank_class_names:
            aps = [
                out[f"AP_{cn}_overall_dist@{t}"]
                for t in DIST_THS
                if f"AP_{cn}_overall_dist@{t}" in out
            ]
            if aps:
                per_class_ap[cn] = float(np.mean(aps))
        mAP = float(np.mean(list(per_class_ap.values()))) if per_class_ap else 0.0
        first = self.bank_class_names[0]
        mATE = out.get(f"ATE_{first}", 1.0)
        mASE = out.get(f"ASE_{first}", 1.0)
        mAOE = out.get(f"AOE_{first}", np.pi)
        n = max(self.tp_count, 1)
        mAVE = self.ave_sum / n if self.tp_count else 1.0
        # devkit convention: classes without attribute labels contribute nan
        # attribute error and are EXCLUDED from the TP-error aggregation
        # (nuscenes devkit detection/evaluate.py nan-masked means) — the
        # movable-as-one protocol has no attributes, so mAAE drops out
        mAAE = (self.aae_sum / n) if self.has_attributes else float("nan")
        errs = (mATE, mASE, mAOE, mAVE, mAAE)
        finite = [e for e in errs if np.isfinite(e)]
        tp_scores = [max(0.0, 1.0 - min(1.0, e)) for e in finite]
        nds = (MEAN_AP_WEIGHT * mAP + sum(tp_scores)) / (
            MEAN_AP_WEIGHT + len(errs) - (len(errs) - len(finite))
        )
        res = {
            "nusc/mAP": mAP,
            "nusc/mATE": mATE,
            "nusc/mASE": mASE,
            "nusc/mAOE": mAOE,
            "nusc/mAVE": mAVE,
            "nusc/mAAE": mAAE,
            "nusc/NDS": nds,
            **{f"nusc/{k}": v for k, v in out.items() if k.startswith("AP_")},
        }
        for cn, ap in per_class_ap.items():
            res[f"nusc/mAP_{cn}"] = ap
        return res
