"""PointPillars anchor pipeline tests."""
import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.models.pointpillars import (
    AnchorCfg,
    assign_targets,
    decode_deltas,
    encode_deltas,
    make_anchors,
)
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes
from liso_tpu.train.pointpillars_train import PointPillarsTrainer
from tests.test_detector import make_boxes, scene_with_objects

BEV = BevSetup((40.0, 40.0), (64, 64))


def test_delta_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-10, 10, (32, 3)),
                rng.uniform(1, 5, (32, 3)),
                rng.uniform(-1, 1, (32, 1)),
            ],
            -1,
        ).astype(np.float32)
    )
    gt = anchors + jnp.asarray(
        rng.uniform(-0.5, 0.5, (32, 7)).astype(np.float32)
    )
    rt = decode_deltas(encode_deltas(gt, anchors), anchors)
    assert np.allclose(np.asarray(rt), np.asarray(gt), atol=1e-4)


def test_assign_targets_positive_at_gt():
    cfg = AnchorCfg()
    anchors = make_anchors(BEV, (16, 16), cfg)
    flat = jnp.asarray(anchors.reshape(-1, 7))
    gt = Boxes.empty(4)
    gt = gt.replace(
        pos=gt.pos.at[0].set(jnp.asarray([5.0, 2.5, -1.0])),
        dims=gt.dims.at[0].set(jnp.asarray([3.9, 1.6, 1.56])),
        valid=gt.valid.at[0].set(True),
    )
    labels, gt_idx = assign_targets(gt, flat, cfg)
    labels = np.asarray(labels)
    assert (labels == 1).sum() >= 1  # force-match guarantees >= 1
    # positives point at gt 0
    assert (np.asarray(gt_idx)[labels == 1] == 0).all()
    # most anchors negative
    assert (labels == 0).sum() > 0.8 * len(labels)


def test_pointpillars_overfit_and_detect():
    rng = np.random.RandomState(0)
    points = jnp.asarray(scene_with_objects(rng))[None]
    valid = jnp.ones(points.shape[:2], bool)
    target = make_boxes(
        pos=[[5.0, 2.0, -1.0], [-8.0, -3.0, -1.0]],
        dims=[[4.0, 2.0, 1.5]] * 2,
        rot=[[0.0], [0.0]],
        k=8,
    )
    tgt = target.with_defaults()
    trainer = PointPillarsTrainer(BEV, max_lr=3e-3, total_steps=300,
                                  confidence_threshold=0.3)
    state = trainer.init_state(jax.random.PRNGKey(0), points, valid)
    losses = []
    for _ in range(220):
        state, m = trainer.train_step(state, points, valid, tgt)
        losses.append(float(m["loss/total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    pred = trainer.predict_step(state, points, valid)
    pv = np.asarray(pred.valid[0])
    assert pv.any(), "no detections after overfit"
    best = np.asarray(pred.pos[0][pv])[0]
    d = min(
        np.linalg.norm(best[:2] - np.array([5.0, 2.0])),
        np.linalg.norm(best[:2] - np.array([-8.0, -3.0])),
    )
    assert d < 3.0, (best, d)
