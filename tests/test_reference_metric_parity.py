"""Golden cross-check: our AP implementation vs the REFERENCE's own
eval/od_metrics.py run in-process (torch-cpu), on identical scenarios.

The reference tree is imported through tests/ref_import_shims (stubs for
shapely/omegaconf/config_helper/iou3d_nms_cuda + the pre-1.9 sklearn
helper); only the distance-matching AP path is exercised, which touches
none of the stubbed code. Skipped when /root/reference is absent.
"""
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not mounted"
)


def _boxes(k, seed):
    r = np.random.RandomState(seed)
    return {
        "pos": np.concatenate(
            [r.uniform(-30, 30, (k, 2)), r.uniform(-1, 1, (k, 1))], -1
        ),
        "dims": r.uniform(1, 4, (k, 3)),
        "rot": r.uniform(-3, 3, (k, 1)),
        "probs": r.uniform(0.05, 1, (k, 1)),
        "velo": r.uniform(0, 2, (k, 1)),
        "class_id": np.zeros((k, 1), np.int64),
    }


def _noisy(gt, seed, extra=3):
    r = np.random.RandomState(seed)
    k = len(gt["pos"])
    pred = {kk: v.copy() for kk, v in gt.items()}
    pred["pos"] = pred["pos"] + r.normal(0, 0.7, pred["pos"].shape)
    pred["probs"] = r.uniform(0.05, 1, (k, 1))
    fp = _boxes(extra, seed + 1000)
    return {kk: np.concatenate([pred[kk], fp[kk]]) for kk in pred}


@pytest.mark.parametrize("use_slow", [True, False])
def test_ap_values_match_reference_implementation(tmp_path, use_slow):
    import ref_import_shims

    ref_import_shims.install()
    import torch
    from liso.eval.od_metrics import ObjectDetectionMetrics as RefODM
    from liso.kabsch.shape_utils import Shape

    from liso_tpu.eval.od_metrics import ObjectDetectionMetrics as OurODM

    def shape(d):
        k = len(d["pos"])
        return Shape(
            pos=torch.tensor(d["pos"]),
            dims=torch.tensor(d["dims"]),
            rot=torch.tensor(d["rot"]),
            probs=torch.tensor(d["probs"]),
            valid=torch.ones(k, dtype=torch.bool),
            velo=torch.tensor(d["velo"]),
        )

    kw = dict(
        moving_velocity_thresh=0.5,
        use_slow_nuscenes_matching=use_slow,
        min_recall=0.1,
        min_precision=0.1,
        box_matching_criterion="dist",
    )
    ref = RefODM(**kw)
    ours = OurODM(**kw)
    for s in range(3):
        g = _boxes(6, s)
        p = _noisy(g, 100 + s)
        ref.update(
            non_batched_gt_boxes=shape(g),
            non_batched_pred_boxes=shape(p),
            sample_token=f"s{s}",
        )
        ours.update(g, p)

    md = ref.log(0, path=str(tmp_path))
    our = ours.compute()
    checked = 0
    for cat in ("overall", "moving", "still"):
        for th in (0.5, 1.0, 2.0, 4.0):
            ref_key = f"/dist/overall/{cat}/AP@{th:.1f}m"
            our_key = f"AP_overall_{cat}_dist@{th}"
            assert ref_key in md, ref_key
            assert our_key in our, our_key
            np.testing.assert_allclose(
                our[our_key], md[ref_key], rtol=0, atol=1e-9,
                err_msg=f"{our_key} vs {ref_key}",
            )
            checked += 1
    assert checked == 12
