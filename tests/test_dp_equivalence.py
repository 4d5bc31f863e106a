"""Data parallelism correctness: the N-device sharded train step must
compute EXACTLY the same thing as the single-device step on the same batch
(VERDICT r3 item 3 — finiteness alone proves nothing). Runs on the 8-device
virtual CPU mesh from conftest. Also multi-step sharded convergence, which
`dryrun_multichip` only spot-checks for one step."""
import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.boxes import Boxes
from liso_tpu.parallel.mesh import make_mesh, shard_batch
from liso_tpu.train.detector_train import DetectorTrainer

from test_slim_train import make_trainer as make_slim_trainer
from test_slim_train import tiny_batch as slim_tiny_batch

BEV = BevSetup(bev_range_m=(32.0, 32.0), grid_size=(64, 64))


def _assert_trees_close(a, b, atol, rtol, what):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=rtol,
            err_msg=what,
        )


def det_batch(b, n=512, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-14, 14, (b, n, 4)).astype(np.float32)
    valid = rng.rand(b, n) > 0.1
    k = 4
    pos = rng.uniform(-10, 10, (b, k, 3)).astype(np.float32)
    pos[..., 2] = -0.5
    boxes = Boxes(
        pos=jnp.asarray(pos),
        dims=jnp.asarray(np.full((b, k, 3), 2.0, np.float32)),
        rot=jnp.asarray(rng.uniform(-1, 1, (b, k, 1)).astype(np.float32)),
        probs=jnp.ones((b, k, 1), jnp.float32),
        valid=jnp.asarray(rng.rand(b, k) > 0.3),
    ).with_defaults()
    return jnp.asarray(pts), jnp.asarray(valid), boxes


def test_slim_sharded_step_equals_single_device():
    mesh = make_mesh()
    ndev = len(mesh.devices.ravel())
    assert ndev > 1, "conftest must provide a multi-device mesh"
    trainer = make_slim_trainer()
    batch = slim_tiny_batch(b=ndev)

    state_a = trainer.init_state(jax.random.PRNGKey(0), batch)
    ref_state, ref_metrics = trainer.train_step(state_a, batch)

    state_b = trainer.init_state(jax.random.PRNGKey(0), batch)
    sharded = shard_batch(mesh, batch)
    dp_state, dp_metrics = trainer.train_step(state_b, sharded)

    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(dp_metrics["loss"]),
        rtol=1e-5, atol=1e-6,
    )
    _assert_trees_close(
        ref_state.params, dp_state.params, atol=1e-6, rtol=1e-5,
        what="sharded SLIM step diverged from single-device step (params)",
    )
    _assert_trees_close(
        ref_state.movavg, dp_state.movavg, atol=1e-5, rtol=1e-5,
        what="sharded SLIM step diverged (threshold state)",
    )


def test_detector_sharded_step_equals_single_device():
    """Loss, gradients AND batch stats of the sharded step match the
    single-device step. Gradients are THE data-parallel contract; the
    comparison runs in float64 where reduction-order rounding cannot hide
    (or fake) a semantic difference — in f32 this net's train-mode-BN
    backward legitimately amplifies reduction-tree rounding to ~1%
    (post-Adam params only encode gradient signs, proving nothing)."""
    mesh = make_mesh()
    ndev = len(mesh.devices.ravel())
    trainer = DetectorTrainer(
        BEV, max_lr=1e-3, total_steps=10, use_baseline_parameters=False
    )
    pts, valid, boxes = det_batch(b=ndev)
    state = trainer.init_state(jax.random.PRNGKey(0), pts, valid)

    with jax.enable_x64(True):
        f64 = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            t,
        )
        params64 = f64(state.params)
        bs64 = f64(state.batch_stats)
        pts64, boxes64 = f64(pts), f64(boxes)

        @jax.jit
        def loss_and_grads(params, pts, valid, boxes):
            def loss_fn(p):
                loss, (new_bs, _, _) = trainer._loss(
                    p, bs64, pts, valid, boxes, None, True
                )
                return loss, new_bs
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            return loss, grads, new_bs

        ref_loss, ref_grads, ref_bs = loss_and_grads(
            params64, pts64, valid, boxes64
        )
        s_pts, s_valid, s_boxes = shard_batch(mesh, (pts64, valid, boxes64))
        dp_loss, dp_grads, dp_bs = loss_and_grads(
            params64, s_pts, s_valid, s_boxes
        )

        np.testing.assert_allclose(
            float(ref_loss), float(dp_loss), rtol=1e-12, atol=1e-12
        )
        _assert_trees_close(
            ref_grads, dp_grads, atol=1e-9, rtol=1e-9,
            what="sharded detector gradients diverged from single-device",
        )
        _assert_trees_close(
            ref_bs, dp_bs, atol=1e-12, rtol=1e-12,
            what="sharded detector step diverged (batch stats)",
        )


def test_detector_sharded_multi_step_converges():
    """5 full sharded optimizer steps: the loss trajectory tracks the
    single-device run (loose tolerance — Adam amplifies sign flips of
    near-zero gradient elements, see above) and decreases."""
    mesh = make_mesh()
    ndev = len(mesh.devices.ravel())
    trainer = DetectorTrainer(
        BEV, max_lr=1e-3, total_steps=10, use_baseline_parameters=False
    )
    pts, valid, boxes = det_batch(b=ndev)
    sharded = shard_batch(mesh, (pts, valid, boxes))

    ref_state = trainer.init_state(jax.random.PRNGKey(0), pts, valid)
    dp_state = trainer.init_state(jax.random.PRNGKey(0), pts, valid)
    ref_losses, dp_losses = [], []
    for _ in range(5):
        ref_state, m = trainer.train_step(ref_state, pts, valid, boxes)
        ref_losses.append(float(m["loss/total"]))
        dp_state, m = trainer.train_step(dp_state, *sharded)
        dp_losses.append(float(m["loss/total"]))
    # early steps track tightly; later steps diverge chaotically in f32
    # (Adam normalizes near-zero gradient elements whose signs flip under
    # a different reduction tree — the f64 test above is the equivalence
    # proof, this one asserts the sharded optimizer run CONVERGES)
    np.testing.assert_allclose(
        ref_losses[:2], dp_losses[:2], rtol=5e-3, atol=1e-4
    )
    assert all(np.isfinite(dp_losses)), dp_losses
    assert dp_losses[-1] < dp_losses[0], dp_losses
