"""Waymo-style detection metrics.

Behavioral reference: liso/eval/od_metrics.py:1397-1919
(WaymoObjectDetectionMetrics + waymo_precisions_recalls_apscore). Key
deltas vs the nuScenes-style bank: a cropped evaluation FoV
(x in [-50, 50], y in [-20, 20] — the KITTI-like front crop), greedy
IoU matching at threshold 0.4 (iou_bev and iou_3d), and the Waymo
recall-gap AP: consecutive PR points further than 0.05 recall apart get
conservative zero-precision points inserted before averaging.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from liso_tpu.eval.od_metrics import (
    BoxArr,
    greedy_match_by_confidence_iou,
)


def waymo_ap(precisions: np.ndarray, recalls: np.ndarray,
             max_recall_gap: float = 0.05) -> float:
    """od_metrics.py:1862-1919 — insert conservative points into recall
    gaps, then average precision over the augmented curve."""
    if len(precisions) == 0:
        return 0.0
    p = list(precisions)
    r = list(recalls)
    if r[-1] < 1.0 - 1e-6:
        # undetected remainder: terminal operating point p(1) = 0
        p.append(0.0)
        r.append(1.0)
    out_p = []
    prev_r, prev_done = None, False
    for i, (pi, ri) in enumerate(zip(p, r)):
        if prev_r is not None:
            gap = ri - prev_r
            if gap > max_recall_gap + 1e-6:
                # insert the conservative (after-gap) precision
                # (od_metrics.py:1880 precision_value_after_gap)
                n_ins = int(gap / max_recall_gap) - 1
                out_p.extend([pi] * n_ins)
        out_p.append(pi)
        prev_r = ri
    return float(np.mean(out_p))


class WaymoObjectDetectionMetrics:
    def __init__(
        self,
        bev_range_min_xy_m: Tuple[float, float] = (-50.0, -20.0),
        bev_range_max_xy_m: Tuple[float, float] = (50.0, 20.0),
        criteria: Sequence[str] = ("iou_bev", "iou_3d"),
        iou_matching_threshold: float = 0.4,
    ):
        self.lo = np.asarray(bev_range_min_xy_m)
        self.hi = np.asarray(bev_range_max_xy_m)
        self.criteria = tuple(criteria)
        self.thresh = iou_matching_threshold
        self.acc = {
            c: {"labels": [], "scores": [], "is_fn": []} for c in self.criteria
        }

    def _crop(self, b: BoxArr) -> BoxArr:
        keep = np.all(
            (b["pos"][:, :2] >= self.lo) & (b["pos"][:, :2] <= self.hi),
            axis=-1,
        )
        return {k: v[keep] for k, v in b.items()}

    def update(self, gt: BoxArr, pred: BoxArr):
        gt = self._crop(gt)
        pred = self._crop(pred)
        for c in self.criteria:
            idx_gt, idx_pred, matched_preds, matched_gts = (
                greedy_match_by_confidence_iou(gt, pred, self.thresh, c)
            )
            a = self.acc[c]
            scores = pred["probs"][:, 0]
            fp = scores[~matched_preds]
            a["labels"].append(np.zeros(len(fp), bool))
            a["scores"].append(fp)
            a["is_fn"].append(np.zeros(len(fp), bool))
            n_fn = int((~matched_gts).sum())
            a["labels"].append(np.ones(n_fn, bool))
            a["scores"].append(np.full(n_fn, -np.inf))
            a["is_fn"].append(np.ones(n_fn, bool))
            if len(idx_pred):
                tp = scores[idx_pred]
                a["labels"].append(np.ones(len(tp), bool))
                a["scores"].append(tp)
                a["is_fn"].append(np.zeros(len(tp), bool))

    def compute(self) -> Dict[str, float]:
        out = {}
        for c in self.criteria:
            a = self.acc[c]
            if not a["labels"]:
                continue
            labels = np.concatenate(a["labels"])
            scores = np.concatenate(a["scores"])
            is_fn = np.concatenate(a["is_fn"])
            order = np.argsort(-scores)
            tp = fp = 0
            n_gt = int(labels.sum())
            precs, recs = [], []
            for i in order:
                if is_fn[i]:
                    continue
                if labels[i]:
                    tp += 1
                else:
                    fp += 1
                precs.append(tp / (tp + fp))
                recs.append(tp / max(n_gt, 1))
            out[f"waymo/AP_{c}@{self.thresh}"] = waymo_ap(
                np.asarray(precs), np.asarray(recs)
            )
        return out
