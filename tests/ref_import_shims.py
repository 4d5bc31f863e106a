"""Import shims that let the REFERENCE's eval/od_metrics.py load in this
image for metric cross-checking (no CUDA, no shapely/omegaconf/
config_helper, sklearn>=1.9 removed _binary_clf_curve).

Only the distance-matching AP code paths are exercised by the parity
tests; every stub below raises if actually called.
"""
from __future__ import annotations

import sys
import types

import numpy as np


class _StubCalled:
    def __init__(self, *a, **k):
        raise RuntimeError("reference stub called — path not under test")


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _no_fn(*a, **k):
    raise RuntimeError("reference stub called — path not under test")


def _binary_clf_curve(y_true, y_score, pos_label=None, sample_weight=None):
    """The pre-1.9 sklearn helper: cumulative fps/tps per distinct score
    threshold, descending-score order."""
    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score, dtype=np.float64)
    pos = y_true == (1 if pos_label is None else pos_label)
    desc = np.argsort(-y_score, kind="mergesort")
    y_score = y_score[desc]
    pos = pos[desc].astype(np.float64)
    w = (
        np.asarray(sample_weight, np.float64)[desc]
        if sample_weight is not None
        else np.ones_like(pos)
    )
    distinct = np.where(np.diff(y_score))[0]
    idxs = np.r_[distinct, len(y_score) - 1]
    tps = np.cumsum(pos * w)[idxs]
    fps = np.cumsum((1.0 - pos) * w)[idxs]
    return fps, tps, y_score[idxs]


class _Quaternion:
    """Minimal pyquaternion.Quaternion stand-in for the vendored nuScenes
    devkit's eval path (quaternion_yaw needs only construction from a
    wxyz sequence + .rotation_matrix)."""

    def __init__(self, *args, **kwargs):
        if kwargs:
            raise RuntimeError("pyquaternion shim: kwargs init not supported")
        if len(args) == 1:
            w, x, y, z = np.asarray(args[0], dtype=np.float64)
        elif len(args) == 4:
            w, x, y, z = (float(a) for a in args)
        else:
            raise RuntimeError("pyquaternion shim: unsupported init")
        self.q = np.array([w, x, y, z], np.float64)

    @property
    def elements(self):
        return self.q

    @property
    def rotation_matrix(self):
        w, x, y, z = self.q / np.linalg.norm(self.q)
        return np.array(
            [
                [
                    1 - 2 * (y * y + z * z),
                    2 * (x * y - z * w),
                    2 * (x * z + y * w),
                ],
                [
                    2 * (x * y + z * w),
                    1 - 2 * (x * x + z * z),
                    2 * (y * z - x * w),
                ],
                [
                    2 * (x * z - y * w),
                    2 * (y * z + x * w),
                    1 - 2 * (x * x + y * y),
                ],
            ]
        )


def install_nuscenes_devkit():
    """Make the VENDORED nuScenes devkit importable (it only needs a
    pyquaternion shim in this image; cv2/matplotlib are present)."""
    sdk = "/root/reference/nuscenes-devkit/python-sdk"
    if sdk not in sys.path:
        sys.path.insert(0, sdk)
    try:
        import pyquaternion  # noqa: F401
    except ImportError:
        _stub("pyquaternion", Quaternion=_Quaternion)
    try:
        import cachetools  # noqa: F401
    except ImportError:  # devkit map_mask decorates with @cached
        _stub(
            "cachetools",
            cached=lambda *a, **k: (lambda fn: fn),
            LRUCache=lambda *a, **k: {},
        )


def install():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    _stub("shapely")
    _stub("shapely.affinity", rotate=_StubCalled, translate=_StubCalled)
    _stub(
        "shapely.geometry", Point=_StubCalled, box=_StubCalled,
        Polygon=_StubCalled,
    )

    class _OC:
        @staticmethod
        def to_container(x, resolve=True):
            return x

        @staticmethod
        def create(x):
            return x

    _stub("omegaconf", OmegaConf=_OC, DictConfig=dict)
    _stub("config_helper")
    _stub(
        "config_helper.config",
        parse_config=_no_fn,
        dumb_load_yaml_to_omegaconf=_no_fn,
        get_config_hash=lambda *a, **k: "0",
        save_config=_no_fn,
    )
    _stub(
        "iou3d_nms_cuda",
        boxes_overlap_bev_gpu=_no_fn,
        boxes_iou_bev_gpu=_no_fn,
        nms_gpu=_no_fn,
        nms_normal_gpu=_no_fn,
        boxes_iou_bev_cpu=_no_fn,
    )
    import sklearn.metrics._ranking as ranking

    if not hasattr(ranking, "_binary_clf_curve"):
        ranking._binary_clf_curve = _binary_clf_curve
