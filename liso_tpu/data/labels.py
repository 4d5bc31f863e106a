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
    # detection-name aliases (devkit collapsed names)
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
    # raw nuScenes category names (label_mappings.yml
    # nuscenes2static_dynamic_ground "dynamic" list; movable_object.* are
    # dynamic-capable for flow but NOT evaluated as movable detections)
    "vehicle.car": "movable",
    "vehicle.truck": "movable",
    "vehicle.bus.bendy": "movable",
    "vehicle.bus.rigid": "movable",
    "vehicle.trailer": "movable",
    "vehicle.construction": "movable",
    "vehicle.emergency.ambulance": "movable",
    "vehicle.emergency.police": "movable",
    "vehicle.motorcycle": "movable",
    "vehicle.bicycle": "movable",
    "human.pedestrian.adult": "movable",
    "human.pedestrian.child": "movable",
    "human.pedestrian.construction_worker": "movable",
    "human.pedestrian.personal_mobility": "movable",
    "human.pedestrian.police_officer": "movable",
    "human.pedestrian.stroller": "movable",
    "human.pedestrian.wheelchair": "movable",
    "animal": "movable",
    "movable_object.barrier": None,
    "movable_object.debris": None,
    "movable_object.pushable_pullable": None,
    "movable_object.trafficcone": None,
    "static_object.bicycle_rack": None,
}

# nuScenes raw category -> official detection name (devkit
# category_to_detection_name; used for the per-class NUSC_OFFICIAL bank)
NUSCENES_CATEGORY_TO_DETECTION_NAME = {
    "vehicle.car": "car",
    "vehicle.truck": "truck",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.trailer": "trailer",
    "vehicle.construction": "construction_vehicle",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
}

# Waymo / AV2 movable maps (reference label_mappings.yml aggregations)
WAYMO_MOVABLE = {
    "TYPE_VEHICLE": "movable",
    "TYPE_PEDESTRIAN": "movable",
    "TYPE_CYCLIST": "movable",
    "TYPE_SIGN": None,
    "TYPE_UNKNOWN": None,
    "VEHICLE": "movable",
    "PEDESTRIAN": "movable",
    "CYCLIST": "movable",
    # OpenPCDet label spelling (waymo_processed_data annos["name"])
    "Vehicle": "movable",
    "Pedestrian": "movable",
    "Cyclist": "movable",
    "Sign": None,
}

AV2_MOVABLE = {
    name: "movable"
    for name in (
        "REGULAR_VEHICLE", "PEDESTRIAN", "BICYCLIST", "MOTORCYCLIST",
        "WHEELED_RIDER", "BOLLARD", "LARGE_VEHICLE", "BUS", "BOX_TRUCK",
        "TRUCK", "VEHICULAR_TRAILER", "TRUCK_CAB", "SCHOOL_BUS",
        "ARTICULATED_BUS", "MOTORCYCLE", "BICYCLE", "WHEELED_DEVICE",
        "WHEELCHAIR", "STROLLER", "DOG",
    )
}
AV2_MOVABLE.update({
    "BOLLARD": None, "CONSTRUCTION_CONE": None, "SIGN": None,
    "CONSTRUCTION_BARREL": None, "STOP_SIGN": None,
    "MOBILE_PEDESTRIAN_CROSSING_SIGN": None, "MESSAGE_BOARD_TRAILER": None,
    "TRAFFIC_LIGHT_TRAILER": None,
})


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
WAYMO_MOVABLE_MAP = LabelMap(WAYMO_MOVABLE)
AV2_MOVABLE_MAP = LabelMap(AV2_MOVABLE)
