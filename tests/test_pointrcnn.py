"""PointRCNN two-stage detector tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from liso_tpu.models.pointrcnn import PointRCNNCfg, PointRCNNNet, pointrcnn_loss
from liso_tpu.ops.bev import BevSetup
from tests.test_detector import make_boxes, scene_with_objects

BEV = BevSetup((40.0, 40.0), (64, 64))


def test_pointrcnn_forward_shapes():
    rng = np.random.RandomState(0)
    points = jnp.asarray(scene_with_objects(rng, n=2048))[None]
    valid = jnp.ones(points.shape[:2], bool)
    net = PointRCNNNet(BEV, cfg=PointRCNNCfg(num_proposals=32, roi_points=32))
    vars_ = net.init(jax.random.PRNGKey(0), points, valid)
    out = net.apply(vars_, points, valid)
    assert out["fg_logit"].shape == (1, 2048)
    assert out["proposals"].pos.shape == (1, 32, 3)
    assert out["refined"].pos.shape == (1, 32, 3)
    assert np.isfinite(np.asarray(out["refined"].pos)).all()


def test_pointrcnn_trains():
    rng = np.random.RandomState(0)
    points = jnp.asarray(scene_with_objects(rng, n=2048))[None]
    valid = jnp.ones(points.shape[:2], bool)
    target = make_boxes(
        pos=[[5.0, 2.0, -1.0], [-8.0, -3.0, -1.0]],
        dims=[[4.0, 2.0, 1.5]] * 2,
        rot=[[0.0], [0.0]],
    ).with_defaults()
    net = PointRCNNNet(BEV, cfg=PointRCNNCfg(num_proposals=32, roi_points=32))
    variables = net.init(jax.random.PRNGKey(0), points, valid)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt):
        def loss_fn(p):
            out, mut = net.apply(
                {"params": p, "batch_stats": bs}, points, valid,
                train=True, mutable=["batch_stats"],
            )
            total, losses = pointrcnn_loss(out, points, valid, target)
            return total, (mut["batch_stats"], losses)

        (l, (bs2, losses)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), bs2, opt2, l

    losses = []
    for _ in range(15):
        params, bs, opt, l = step(params, bs, opt)
        losses.append(float(l))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    # foreground logits go up on object points (last 512 points are objects)
    out = net.apply({"params": params, "batch_stats": bs}, points, valid)
    fg = np.asarray(jax.nn.sigmoid(out["fg_logit"][0]))
    assert fg[-512:].mean() > fg[:-512].mean()


def test_pointrcnn_trainer_step_and_predict():
    """PointRCNNTrainer plugs into the rounds loop like the other trainers:
    train_step reduces the loss, predict_step emits NMS'd Boxes."""
    from tests.test_detector import make_boxes, scene_with_objects
    from liso_tpu.ops.bev import BevSetup
    from liso_tpu.train.pointrcnn_train import PointRCNNTrainer

    rng = np.random.RandomState(0)
    bev = BevSetup((40.0, 40.0), (64, 64))
    points = jnp.asarray(scene_with_objects(rng))[None]
    valid = jnp.ones(points.shape[:2], bool)
    tgt = make_boxes(
        pos=[[5.0, 2.0, -1.0], [-8.0, -3.0, -1.0]],
        dims=[[4.0, 2.0, 1.5]] * 2,
        rot=[[0.0], [0.0]],
        k=8,
    ).with_defaults()
    # same overfit conditions as the CenterPoint bar
    # (test_detector_trains_and_detects: max_lr 3e-3, 250 OneCycle steps)
    trainer = PointRCNNTrainer(bev, max_lr=3e-3, total_steps=250,
                               confidence_threshold=0.0)
    state = trainer.init_state(jax.random.PRNGKey(0), points, valid)
    losses = []
    rescores = []
    for _ in range(250):
        state, m = trainer.train_step(state, points, valid, tgt)
        losses.append(float(m["loss/total"]))
        rescores.append(float(m["loss/rescore"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    # the IoU-based stage-2 re-scoring head learns (reference RoI cls)
    assert rescores[-1] < rescores[0], (rescores[0], rescores[-1])
    pred = trainer.predict_step(state, points, valid)
    pv = np.asarray(pred.valid[0])
    assert pv.any()
    assert np.isfinite(np.asarray(pred.pos)).all()
    # overfit localization at the same bar as the CenterPoint test: the
    # highest-confidence box lands near one of the planted objects
    best = np.asarray(pred.pos[0][pv])[0]
    d = min(
        np.linalg.norm(best[:2] - np.array([5.0, 2.0])),
        np.linalg.norm(best[:2] - np.array([-8.0, -3.0])),
    )
    assert d < 3.0, (best, d)


def test_grid_ball_query_matches_brute_force():
    """The k in-radius neighbors (nearest-first) must match an O(N^2)
    reference, including invalid queries/candidates and off-grid points."""
    from liso_tpu.ops.ball_query import grid_ball_query

    rng = np.random.RandomState(0)
    n, r, k = 600, 1.5, 8
    pts = rng.uniform(-18, 18, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 0, n)
    valid = rng.rand(n) > 0.2
    idx, mask = grid_ball_query(
        jnp.asarray(pts), jnp.asarray(valid), radius=r, k=k,
        bev_range_m=(40.0, 40.0), cap=32,
    )
    idx, mask = np.asarray(idx), np.asarray(mask)
    for i in range(n):
        if not valid[i]:
            assert not mask[i].any()
            continue
        d = np.linalg.norm(pts - pts[i], axis=1)
        cand = np.where((d <= r) & valid)[0]
        want = np.sort(d[cand[np.argsort(d[cand])][:k]])
        got = np.sort(d[idx[i][mask[i]]])
        # ties at the k-th distance may swap members; distances must agree
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_set_abstraction_permutation_invariant():
    """Masked max over the grouped neighbors must not depend on the
    neighbor order (PointNet invariance)."""
    from liso_tpu.models.pointrcnn import SetAbstraction

    rng = np.random.RandomState(1)
    pts = rng.uniform(-10, 10, (1, 256, 4)).astype(np.float32)
    valid = jnp.ones((1, 256), bool)
    sa = SetAbstraction(BEV, radius=2.0, k=8, out_dim=16)
    vars_ = sa.init(jax.random.PRNGKey(0), jnp.asarray(pts), valid)
    out1 = sa.apply(vars_, jnp.asarray(pts), valid)
    perm = rng.permutation(256)
    out2 = sa.apply(vars_, jnp.asarray(pts[:, perm]), valid)
    np.testing.assert_allclose(
        np.asarray(out1)[0, perm], np.asarray(out2)[0], atol=2e-5
    )
