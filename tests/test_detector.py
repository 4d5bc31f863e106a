"""Detector stack tests: centermap rendering, losses, end-to-end training."""
import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.data.centermaps import render_centermaps
from liso_tpu.models.box_decode import BoxPredictionCfg
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes
from liso_tpu.train.detector_train import DetectorTrainer

BEV = BevSetup(bev_range_m=(40.0, 40.0), grid_size=(64, 64))
CFG = BoxPredictionCfg()


def make_boxes(pos, dims, rot, k=4):
    n = len(pos)
    b = Boxes.empty(k, batch=(1,))
    return b.replace(
        pos=b.pos.at[0, :n].set(jnp.asarray(pos)),
        dims=b.dims.at[0, :n].set(jnp.asarray(dims)),
        rot=b.rot.at[0, :n].set(jnp.asarray(rot)),
        probs=b.probs.at[0, :n].set(1.0),
        valid=b.valid.at[0, :n].set(True),
    )


def test_centermap_rendering():
    boxes = make_boxes(
        pos=[[5.0, 2.0, -1.0], [-8.0, -3.0, -1.0]],
        dims=[[4.0, 2.0, 1.5], [4.0, 2.0, 1.5]],
        rot=[[0.3], [1.2]],
    )
    maps = render_centermaps(boxes, BEV, (32, 32), CFG)
    heat = np.asarray(maps["probs"][0, ..., 0])
    assert heat.max() > 0.99  # peak at the center cell
    # box at (5, 2) -> row = (5+20)/40*32 = 20, col = 17.6
    r, c = 20, 17
    assert heat[r, c] > 0.8, heat[r, c]
    # far away from both boxes the heat is ~0
    assert heat[2, 30] < 1e-3
    # center mask has exactly 2 cells
    assert int(maps["center_bool_mask"].sum()) == 2
    # dims map at the peak carries the box dims
    assert np.allclose(np.asarray(maps["dims"][0, r, c]), [4.0, 2.0, 1.5], atol=1e-5)
    # rot map is (sin, cos)
    assert np.allclose(
        np.asarray(maps["rot"][0, r, c]), [np.sin(0.3), np.cos(0.3)], atol=1e-5
    )


def test_empty_boxes_render_zero():
    boxes = Boxes.empty(4, batch=(1,))
    maps = render_centermaps(boxes, BEV, (32, 32), CFG)
    assert float(maps["probs"].sum()) == 0.0
    assert int(maps["center_bool_mask"].sum()) == 0


def scene_with_objects(rng, n=1024):
    """Background + 2 dense box-shaped clusters."""
    bg = rng.uniform(-18, 18, (n - 512, 3)).astype(np.float32)
    bg[:, 2] = rng.uniform(-1.8, 0.5, len(bg))
    o1 = rng.uniform(-1, 1, (256, 3)).astype(np.float32) * [2.0, 1.0, 0.7] + [
        5.0, 2.0, -1.0,
    ]
    o2 = rng.uniform(-1, 1, (256, 3)).astype(np.float32) * [2.0, 1.0, 0.7] + [
        -8.0, -3.0, -1.0,
    ]
    pts = np.concatenate([bg, o1, o2]).astype(np.float32)
    inten = rng.rand(n, 1).astype(np.float32)
    return np.concatenate([pts, inten], axis=-1)


def test_detector_trains_and_detects():
    rng = np.random.RandomState(0)
    points = jnp.asarray(scene_with_objects(rng))[None]
    valid = jnp.ones(points.shape[:2], bool)
    target = make_boxes(
        pos=[[5.0, 2.0, -1.0], [-8.0, -3.0, -1.0]],
        dims=[[4.0, 2.0, 1.5], [4.0, 2.0, 1.5]],
        rot=[[0.0], [0.0]],
    )
    trainer = DetectorTrainer(
        BEV, max_lr=3e-3, total_steps=250, confidence_threshold=0.3,
        use_baseline_parameters=False,
    )
    state = trainer.init_state(jax.random.PRNGKey(0), points, valid)
    losses = []
    # BN running stats (momentum 0.99, reference parity) need a few hundred
    # steps before eval mode matches train mode
    for _ in range(220):
        state, metrics = trainer.train_step(state, points, valid, target)
        losses.append(float(metrics["loss/total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])

    pred = trainer.predict_step(state, points, valid)
    pv = np.asarray(pred.valid[0])
    assert pv.any(), "no detections after overfitting"
    # best box lands near one of the planted objects
    best = np.asarray(pred.pos[0][pv])[0]
    d = min(
        np.linalg.norm(best[:2] - np.array([5.0, 2.0])),
        np.linalg.norm(best[:2] - np.array([-8.0, -3.0])),
    )
    assert d < 3.0, (best, d)


def test_echo_gt_network():
    from liso_tpu.models.box_learner import BoxLearner

    target = make_boxes(pos=[[1.0, 1.0, 0.0]], dims=[[4, 2, 1.5]], rot=[[0.1]])
    model = BoxLearner(BEV, network="echo_gt")
    pts = jnp.zeros((1, 8, 4))
    out, _, _, _ = model.apply({}, pts, jnp.ones((1, 8), bool), gt_boxes=target)
    assert np.allclose(np.asarray(out.pos), np.asarray(target.pos))


def test_shared_pillar_prep_matches_unshared():
    """BoxLearner with a caller-provided prepare_pillar_inputs result is
    identical to the self-contained path (the fused streaming step shares
    one prep between the SLIM and detector encoders)."""
    from liso_tpu.models.box_learner import BoxLearner
    from liso_tpu.models.pillar_encoder import prepare_pillar_inputs

    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.uniform(-18, 18, (2, 256, 4)).astype(np.float32))
    valid = jnp.asarray(rng.rand(2, 256) > 0.1)

    det = BoxLearner(BEV, network="centerpoint")
    vars_ = det.init(jax.random.PRNGKey(0), pts, valid)

    boxes_a, dec_a, _, aux_a = det.apply(vars_, pts, valid)
    prepared = prepare_pillar_inputs(pts, valid, BEV)
    boxes_b, dec_b, _, aux_b = det.apply(vars_, pts, valid, prepared=prepared)

    np.testing.assert_array_equal(np.asarray(boxes_a.pos), np.asarray(boxes_b.pos))
    np.testing.assert_array_equal(np.asarray(boxes_a.probs), np.asarray(boxes_b.probs))
    np.testing.assert_array_equal(
        np.asarray(aux_a["occupancy"]), np.asarray(aux_b["occupancy"])
    )


def test_sep_head_fusion_is_exact():
    """The MXU-fused SepHead (one wide hidden conv + one BN across all
    heads) computes EXACTLY the per-head composition: conv concat is
    output-stacking and BatchNorm is per-channel, so slicing the fused
    weights reproduces each head independently."""
    import jax

    from liso_tpu.models.centerpoint import SepHead

    heads = (("pos", 3), ("dims", 3), ("rot", 2), ("probs", 1))
    hc = 8
    m = SepHead(heads=heads, head_conv=hc)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 12)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, True)
    out, _ = m.apply(variables, x, True, mutable=["batch_stats"])
    p = variables["params"]

    dn = ("NHWC", "HWIO", "NHWC")
    for j, (name, _) in enumerate(heads):
        sl = slice(j * hc, (j + 1) * hc)
        k = p["fused_conv0"]["kernel"][..., sl]
        b = p["fused_conv0"]["bias"][sl]
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn
        ) + b
        mean = y.mean(axis=(0, 1, 2))
        var = ((y - mean) ** 2).mean(axis=(0, 1, 2))
        y = (y - mean) / jnp.sqrt(var + 1e-3)
        y = y * p["fused_bn0"]["scale"][sl] + p["fused_bn0"]["bias"][sl]
        y = jnp.maximum(y, 0.0)
        z = jax.lax.conv_general_dilated(
            y, p[f"{name}_final"]["kernel"], (1, 1), "SAME",
            dimension_numbers=dn,
        ) + p[f"{name}_final"]["bias"]
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(z), atol=2e-5,
            err_msg=f"fused SepHead diverged from per-head math for {name}",
        )


def test_fused_scatter_matches_per_encoder_path():
    """fused_scatter_images (one C=128 scatter for SLIM + detector) is
    identical to each encoder scattering its own features: same images,
    same occupancy, same downstream boxes (bench.py's fused_streaming)."""
    from liso_tpu.models.box_learner import BoxLearner
    from liso_tpu.models.pillar_encoder import (
        fused_scatter_images, prepare_pillar_inputs,
    )
    from liso_tpu.models.slim import SlimModel

    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.uniform(-18, 18, (2, 256, 4)).astype(np.float32))
    valid = jnp.asarray(rng.rand(2, 256) > 0.1)

    slim = SlimModel(bev=BEV, num_iters=2)
    det = BoxLearner(BEV, network="centerpoint")
    svars = slim.init(jax.random.PRNGKey(0), pts, valid, pts, valid)
    dvars = det.init(jax.random.PRNGKey(1), pts, valid)

    # unfused: each encoder scatters its own image
    fmap_a, cn_a, occ_a = slim.apply(
        svars, pts, valid, method=SlimModel.encode_frame
    )
    boxes_a, _, _, aux_a = det.apply(dvars, pts, valid)

    # fused: one prep, one scatter call, images fed back in
    prepared = prepare_pillar_inputs(pts, valid, BEV)
    x_s, _ = slim.apply(
        svars, pts, valid, method=SlimModel.pillar_point_feats,
        prepared=prepared,
    )
    x_d, _ = det.apply(dvars, pts, valid, point_feats_only=True,
                       prepared=prepared)
    (img_s, img_d), occ = fused_scatter_images([x_s, x_d], prepared, BEV)
    fmap_b, cn_b, occ_b = slim.apply(
        svars, pts, valid, method=SlimModel.encode_frame,
        pillar_image=(img_s, occ),
    )
    boxes_b, _, _, aux_b = det.apply(dvars, pts, valid,
                                     pillar_image=(img_d, occ))

    np.testing.assert_allclose(
        np.asarray(fmap_a), np.asarray(fmap_b), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))
    np.testing.assert_allclose(
        np.asarray(boxes_a.pos), np.asarray(boxes_b.pos), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(aux_a["occupancy"]), np.asarray(aux_b["occupancy"])
    )
