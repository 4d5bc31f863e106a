"""Class label maps (reference: liso/datasets/labelmap/__init__.py:46-196 +
the KITTI class collapsing of torch_dataset_commons.py:43-71)."""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

KITTI_MOVABLE_CLASSES = ("Car", "Pedestrian", "Cyclist")

KITTI_MAP_TO_SIMPLE_CLASSES = {
    "Car": "Car",
    "PassengerCar": "Car",
    "Pedestrian": "Pedestrian",
    "Person": "Pedestrian",
    "Van": "Car",
    "Truck": "Car",
    "Person_sitting": "Pedestrian",
    "Cyclist": "Cyclist",
    "Tram": "Car",
}

KITTI_IGNORE_NON_MOVABLE_CLASSMAPPING = {
    "Unknown": None,
    "DontCare": None,
    "Car": "movable",
    "PassengerCar": "movable",
    "Pedestrian": "movable",
    "Person": "movable",
    "Van": "movable",
    "Truck": "movable",
    "Person_sitting": None,
    "Cyclist": "movable",
    "Tram": "movable",
    "Misc": None,
    "LargeVehicle": "movable",
}

NUSCENES_MOVABLE = {
    "car": "movable",
    "truck": "movable",
    "bus": "movable",
    "trailer": "movable",
    "construction_vehicle": "movable",
    "pedestrian": "movable",
    "motorcycle": "movable",
    "bicycle": "movable",
    "traffic_cone": None,
    "barrier": None,
}


class LabelMap:
    """name -> contiguous class idx, with unmapped names -> -1 (ignore)."""

    def __init__(self, mapping: Dict[str, Optional[str]]):
        self.mapping = mapping
        targets = sorted({v for v in mapping.values() if v is not None})
        self.class_names = tuple(targets)
        self.name_to_idx = {n: i for i, n in enumerate(targets)}

    def idxs_from_names(self, names: Sequence[str]) -> np.ndarray:
        out = np.full(len(names), -1, np.int32)
        for i, n in enumerate(names):
            tgt = self.mapping.get(str(n))
            if tgt is not None:
                out[i] = self.name_to_idx[tgt]
        return out


KITTI_MOVABLE_MAP = LabelMap(KITTI_IGNORE_NON_MOVABLE_CLASSMAPPING)
NUSCENES_MOVABLE_MAP = LabelMap(NUSCENES_MOVABLE)
