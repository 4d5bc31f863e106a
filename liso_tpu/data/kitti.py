"""KITTI dataset subclasses (raw / tracking / object).

Behavioral reference: liso/datasets/{kitti_raw_torch_dataset.py:24-452,
kitti_tracking_torch_dataset.py, kitti_object_torch_dataset.py:238-242}.
All three consume the per-sample npy dicts written by the ETL scripts
(liso_tpu.data.create_kitti / reference datasets/kitti/create_*.py — the
formats are identical):

  * raw:      pcl_t0/t1/t2, is_ground_*, odom_t0_t1/t0_t2, kiss_odom_*,
              name "date_drive_frameidx" (no labels -> training split);
  * tracking: like raw + objects_{tk} GT boxes (flow eval / val);
  * object:   pcl_t0 (+pcl_t1 from matched raw) + objects_t0 + ignore
              regions (detection eval).
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from liso_tpu.data.dataset import DataCfg, LidarDataset
from liso_tpu.data.labels import KITTI_MOVABLE_MAP


def _boxes_from_objects(objects: dict, label_map=KITTI_MOVABLE_MAP):
    """objects_{tk} = {poses [K,4,4], size [K,3], category [K]} ->
    box attr dict (torch_dataset_commons.kitti_extract_boxes_for_timestamp).
    """
    poses = np.asarray(objects["poses"], np.float64)
    if poses.ndim == 2:
        poses = poses[None]
    k = len(poses)
    if k == 0:
        return None
    pos = poses[:, :3, 3].astype(np.float32)
    rot = np.arctan2(poses[:, 1, 0], poses[:, 0, 0]).astype(np.float32)[:, None]
    dims = np.asarray(objects["size"], np.float32).reshape(k, 3)
    class_id = label_map.idxs_from_names(
        [str(c) for c in np.asarray(objects["category"]).reshape(-1)]
    )[:, None]
    keep = class_id[:, 0] >= 0
    return {
        "pos": pos[keep],
        "dims": dims[keep],
        "rot": rot[keep],
        "probs": np.ones((keep.sum(), 1), np.float32),
        "velo": np.zeros((keep.sum(), 1), np.float32),
        "class_id": class_id[keep].astype(np.float32),
    }


class KittiRawDataset(LidarDataset):
    """Training split: no labels (kitti_raw_torch_dataset.py:24)."""

    SUBDIR = "kitti_raw"

    def __init__(self, cfg: DataCfg, root: Path, **kw):
        root = Path(root)
        d = root / self.SUBDIR if (root / self.SUBDIR).exists() else root
        files = sorted(d.glob("*.npy"))
        if not files:
            raise FileNotFoundError(f"no {self.SUBDIR} samples under {root}")
        super().__init__(cfg, files, **kw)
        # sequences keyed by date_drive prefix
        self._seqs = {}
        for i, f in enumerate(files):
            key = "_".join(f.stem.split("_")[:-1])
            self._seqs.setdefault(key, []).append(i)
        self._seq_keys = sorted(self._seqs)

    @property
    def num_sequences(self):
        return len(self._seq_keys)

    def get_consecutive_sample_idxs_for_sequence(self, seq_of_idx: int):
        return self._seqs[self._seq_keys[seq_of_idx % len(self._seq_keys)]]


class KittiTrackingDataset(KittiRawDataset):
    """Val split with GT boxes + (optionally) GT flow
    (kitti_tracking_torch_dataset.py)."""

    SUBDIR = "kitti_tracking"

    def extract_gt_boxes(self, content: dict, time_key: str):
        gt = content.get("gt", content)
        objects = gt.get(f"objects_{time_key}")
        if objects is None:
            return None
        return _boxes_from_objects(objects)


class KittiObjectDataset(KittiTrackingDataset):
    """Detection eval split (kitti_object_torch_dataset.py); samples carry
    only (t0, t1) so skip frames are disabled."""

    SUBDIR = "kitti_object"

    def __init__(self, cfg: DataCfg, root: Path, **kw):
        super().__init__(cfg._replace(use_skip_frames="never"), root, **kw)

    def select_time_keys(self):
        return "t0", "t1", self.cfg.time_delta_s
