"""Validation loop: predictor (network | mined DB | flow clusters) vs GT.

Behavioral reference: liso/eval/eval_ours.py:120-758 (run_val). Feeds the
same metric banks regardless of predictor type so mined DBs are evaluated
through exactly the detector-eval path (eval_ours.py:281-291).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import numpy as np

from liso_tpu.eval.od_metrics import ObjectDetectionMetrics


def _to_valid_arrays(boxes: Dict[str, np.ndarray], b: int):
    """Batched padded box dict -> list of valid-only dicts."""
    out = []
    for i in range(b):
        v = np.asarray(boxes["valid"][i]).astype(bool)
        out.append(
            {
                k: np.asarray(x[i])[v]
                for k, x in boxes.items()
                if k != "valid"
            }
        )
    return out


KITTI_CAM_MIN_ANGLE_DEG = -41.95
KITTI_CAM_MAX_ANGLE_DEG = 40.16


def count_box_points_in_kitti_annotated_fov(
    boxes: Dict[str, np.ndarray], pcl: np.ndarray
) -> np.ndarray:
    """Points per box counting ONLY points inside the KITTI camera opening
    angle, with the box height ignored
    (eval_ours.count_box_points_in_kitti_annotated_fov:97-117). boxes:
    flat dict of [K, ...] arrays; pcl [N, >=3]."""
    ang = np.arctan2(pcl[:, 1], pcl[:, 0])
    in_fov = (ang >= np.deg2rad(KITTI_CAM_MIN_ANGLE_DEG)) & (
        ang <= np.deg2rad(KITTI_CAM_MAX_ANGLE_DEG)
    )
    p = pcl[in_fov, :3]
    counts = np.zeros(len(boxes["pos"]), np.int64)
    for i in range(len(boxes["pos"])):
        c, d = boxes["pos"][i], boxes["dims"][i]
        yaw = float(np.reshape(boxes["rot"][i], (-1,))[0])
        rel = p[:, :2] - c[:2]
        ca, sa = np.cos(-yaw), np.sin(-yaw)
        lx = rel[:, 0] * ca - rel[:, 1] * sa
        ly = rel[:, 0] * sa + rel[:, 1] * ca
        counts[i] = int(
            np.count_nonzero(
                (np.abs(lx) <= d[0] / 2) & (np.abs(ly) <= d[1] / 2)
            )
        )
    return counts


def run_val(
    batches: Iterable[dict],
    predict_boxes: Callable[[dict], Dict[str, np.ndarray]],
    *,
    moving_velocity_thresh: float = 0.1,
    criteria=("dist", "iou_bev"),
    max_batches: Optional[int] = None,
    kitti_annotated_fov_filter: bool = False,
    min_pts_in_annotated_fov: int = 10,
) -> Dict[str, float]:
    """predict_boxes(batch) -> batched padded box dict (with 'valid').
    Batches must carry 'gt_boxes'. With kitti_annotated_fov_filter,
    predictions outside the labeled camera FoV are dropped using the
    full-with-ground cloud ('pcl_full_w_ground' in the batch), mirroring
    eval_ours.py:386-402 for KITTI tracking/object datasets."""
    banks = {
        c: ObjectDetectionMetrics(
            moving_velocity_thresh=moving_velocity_thresh,
            box_matching_criterion=c,
        )
        for c in criteria
    }
    n = 0
    for batch in batches:
        if max_batches is not None and n >= max_batches:
            break
        n += 1
        pred = predict_boxes(batch)
        b = len(batch["sample_id"])
        gts = _to_valid_arrays(batch["gt_boxes"], b)
        preds = _to_valid_arrays(pred, b)
        if kitti_annotated_fov_filter and "pcl_full_w_ground" in batch:
            for i, p in enumerate(preds):
                pcl_i = np.asarray(batch["pcl_full_w_ground"][i])
                if len(p["pos"]):
                    n_pts = count_box_points_in_kitti_annotated_fov(p, pcl_i)
                    keep = n_pts >= min_pts_in_annotated_fov
                    preds[i] = {k: v[keep] for k, v in p.items()}
        for g, p in zip(gts, preds):
            for bank in banks.values():
                bank.update(g, p)
    out: Dict[str, float] = {}
    for c, bank in banks.items():
        out.update(bank.compute())
    return out


def mined_db_predictor(mined_db: Dict[str, dict]):
    """eval_ours.py:281-291: a mined-box DB dict acts as the predictor."""

    def predict(batch):
        b = len(batch["sample_id"])
        k_max = max(
            [len(mined_db.get(sid, {"track_id": []})["track_id"]) for sid in
             batch["sample_id"]] + [1]
        )
        out = {
            "pos": np.zeros((b, k_max, 3), np.float32),
            "dims": np.zeros((b, k_max, 3), np.float32),
            "rot": np.zeros((b, k_max, 1), np.float32),
            "probs": np.zeros((b, k_max, 1), np.float32),
            "velo": np.zeros((b, k_max, 1), np.float32),
            "valid": np.zeros((b, k_max), bool),
        }
        for i, sid in enumerate(batch["sample_id"]):
            entry = mined_db.get(sid)
            if entry is None:
                continue
            raw = entry["raw_box"]
            k = len(raw["pos"])
            for key in ("pos", "dims", "rot", "probs", "velo"):
                if key in raw:
                    out[key][i, :k] = raw[key]
            out["valid"][i, :k] = True
        return out

    return predict
