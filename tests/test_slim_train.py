"""End-to-end SLIM training smoke tests on tiny shapes (CPU, 8 virtual
devices via conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liso_tpu.data.sample import FlowSample, PointCloud
from liso_tpu.losses.slim_loss import SlimLossCfg
from liso_tpu.models.slim import movavg_init, movavg_update, movavg_value
from liso_tpu.ops.bev import BevSetup
from liso_tpu.parallel.mesh import make_mesh, shard_batch
from liso_tpu.train.slim_train import SlimTrainer


def tiny_batch(b=2, n=256, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: PointCloud(
        pcl=jnp.asarray(rng.uniform(-14, 14, (b, n, 4)).astype(np.float32)),
        valid=jnp.asarray(rng.rand(b, n) > 0.1),
    )
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    return FlowSample(pcl_t0=mk(), pcl_t1=mk(), odom_t0_t1=eye, odom_t1_t0=eye)


def make_trainer(**kw):
    bev = BevSetup(bev_range_m=(32.0, 32.0), grid_size=(32, 32))
    defaults = dict(
        num_iters=2,
        predict_weight_for_static_aggregation="sigmoid",
        use_static_aggr_flow_for_aggr_flow=True,
        loss_cfg=SlimLossCfg(
            knn_on_dynamic_penalty=1.0,
            knn_on_static_penalty=1.0,
            knn_chunk=256,
        ),
        num_train_samples=10,
        warmup_steps=2,
        train_steps=10,
    )
    defaults.update(kw)
    return SlimTrainer(bev, **defaults)


def test_train_step_runs_and_updates():
    trainer = make_trainer()
    batch = tiny_batch()
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.tree.map(lambda x: x.copy(), state.params)
    # warmup LR is 0 at step 0 (reference polynomial-warmup semantics), so
    # step twice to see a param update
    state, _ = trainer.train_step(state, batch)
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 2
    # params changed somewhere
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params))
    )
    assert diff > 0
    # threshold histogram got an update
    assert float(state.movavg.bias_counter) > 0


def test_loss_decreases_over_steps():
    trainer = make_trainer()
    batch = tiny_batch()
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    # 6 steps: warmup (2 steps) ends mid-run and Adam's first full-LR
    # steps produce a benign transient at this toy scale; the blow-up
    # check is on the recovered loss, not the transient peak
    for _ in range(6):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] * 1.5  # recovered, no blow-up


def test_data_parallel_sharded_step():
    mesh = make_mesh()
    ndev = len(mesh.devices)
    trainer = make_trainer()
    batch = tiny_batch(b=ndev)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    sharded = shard_batch(mesh, batch)
    state, metrics = trainer.train_step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))


def test_movavg_threshold_converges():
    mov = movavg_init(num_train_samples=10)
    assert float(movavg_value(mov)) == 0.5
    # points with dynamicness > 0.3 get big improvement from dynamic flow
    n = 1000
    scores = jnp.asarray(np.linspace(0, 1, n, dtype=np.float32))
    epes_stat = jnp.where(scores > 0.3, 2.0, 0.1)
    epes_dyn = jnp.where(scores > 0.3, 0.1, 0.5)
    valid = jnp.ones((n,), bool)
    for _ in range(50):
        mov = movavg_update(mov, epes_stat, epes_dyn, scores, valid)
    thr = float(movavg_value(mov))
    assert 0.25 < thr < 0.35, thr


def test_predict_step():
    trainer = make_trainer()
    batch = tiny_batch()
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    pred_fw, pred_bw = trainer.predict_step(state, batch)
    assert pred_fw.aggregated_flow.shape == batch.pcl_t0.pcl.shape[:2] + (3,)
    assert np.all(np.isfinite(np.asarray(pred_fw.aggregated_flow)))


def test_movavg_supervised_mode():
    """Supervised branch: class counters weight the improvements
    (movavg_cls_threshold.py:79-90)."""
    from liso_tpu.models.slim import movavg_init, movavg_update, movavg_value

    mov = movavg_init(num_train_samples=10, num_moving=1000, num_still=1000)
    assert float(mov.moving_counter) == 1000
    n = 400
    scores = jnp.asarray(np.linspace(0, 1, n, dtype=np.float32))
    moving = scores > 0.4
    epes_stat = jnp.where(moving, 1.5, 0.1)
    epes_dyn = jnp.where(moving, 0.1, 0.6)
    valid = jnp.ones((n,), bool)
    for _ in range(50):
        mov = movavg_update(mov, epes_stat, epes_dyn, scores, valid,
                            moving_mask=moving)
    assert float(mov.moving_counter) > 1000  # counters grew
    thr = float(movavg_value(mov))
    assert 0.3 < thr < 0.5, thr


def test_batched_knn_matches_per_call():
    """flow_knn_multi / batched_knn_for_iterations must return exactly the
    per-call flow_knn results (one kernel dispatch vs 36)."""
    import numpy as np

    from liso_tpu.losses.slim_loss import (
        SlimLossCfg, flow_knn, flow_knn_multi,
    )

    rng = np.random.RandomState(0)
    b, n = 2, 1024
    pca = jnp.asarray(rng.uniform(-20, 20, (b, n, 4)).astype(np.float32))
    pcb = jnp.asarray(rng.uniform(-20, 20, (b, n, 4)).astype(np.float32))
    va = jnp.asarray(rng.rand(b, n) > 0.3)
    vb = jnp.asarray(rng.rand(b, n) > 0.3)
    flows = {
        k: jnp.asarray(rng.normal(0, 0.5, (b, n, 3)).astype(np.float32))
        for k in ("aggregated", "dynamic", "static_aggr")
    }
    multi = flow_knn_multi(pca, va, pcb, vb, flows, chunk=512)
    for k, fl in flows.items():
        w_ref, d_ref = flow_knn(pca, va, pcb, vb, fl, chunk=512)
        w_got, d_got = multi[k]
        np.testing.assert_array_equal(np.asarray(w_got), np.asarray(w_ref))
        np.testing.assert_allclose(
            np.asarray(d_got), np.asarray(d_ref), rtol=0, atol=1e-5
        )


def test_pallas_knn_concatenated_sets_exact():
    """The banded kernel on concatenated query sets (the batched loss path)
    must match per-set calls — chunk visit bands are per-chunk, so mixed
    or straddling chunks stay exact (interpret mode)."""
    import numpy as np

    from liso_tpu.ops.knn_pallas import nn_1_sorted

    rng = np.random.RandomState(1)
    b, n = 1, 768  # NOT a multiple of the 512-query chunk: sets straddle
    def cloud(seed):
        r = np.random.RandomState(seed)
        pts = r.uniform(-30, 30, (b, n, 3)).astype(np.float32)
        pts = np.take_along_axis(
            pts, np.argsort(pts[..., 0], axis=-1)[..., None], axis=1
        )
        valid = np.zeros((b, n), bool)
        valid[:, : int(0.8 * n)] = True
        return jnp.asarray(pts), jnp.asarray(valid)

    refs, rv = cloud(2)
    q1, v1 = cloud(3)
    q2, v2 = cloud(4)
    q_cat = jnp.concatenate([q1, q2], axis=1)
    v_cat = jnp.concatenate([v1, v2], axis=1)
    d_cat, i_cat = nn_1_sorted(q_cat, refs, v_cat, rv, 8.0, interpret=True)
    d1, i1 = nn_1_sorted(q1, refs, v1, rv, 8.0, interpret=True)
    d2, i2 = nn_1_sorted(q2, refs, v2, rv, 8.0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(d_cat[:, :n]), np.asarray(d1), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_cat[:, n:]), np.asarray(d2), rtol=0, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(i_cat[:, :n]), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i_cat[:, n:]), np.asarray(i2))


def test_batched_iterations_knn_matches_inline():
    """batched_knn_for_iterations (one dispatch + one batched outlier sort
    for all iterations x types) must reproduce the per-iteration inline kNN
    losses exactly."""
    import numpy as np

    from liso_tpu.losses.slim_loss import (
        SlimLossCfg, batched_knn_for_iterations, flow_knn, knn_flow_types,
        nearest_point_loss,
    )

    cfg = SlimLossCfg()._replace(
        bev_extent=(-20.0, -20.0, 20.0, 20.0),
        use_static_aggr_flow_for_aggr_flow=True,
        knn=SlimLossCfg().knn._replace(drop_outliers_perc=5.0),
    )
    rng = np.random.RandomState(0)
    b, n = 2, 512

    class P:
        pass

    preds = []
    for _ in range(3):
        p = P()
        for t in ("aggregated", "dynamic", "static_aggr"):
            setattr(p, f"{t}_flow", jnp.asarray(
                rng.normal(0, 0.5, (b, n, 3)).astype(np.float32)))
        preds.append(p)
    pca = jnp.asarray(rng.uniform(-15, 15, (b, n, 4)).astype(np.float32))
    pcb = jnp.asarray(rng.uniform(-15, 15, (b, n, 4)).astype(np.float32))
    va = jnp.asarray(rng.rand(b, n) > 0.2)
    vb = jnp.asarray(rng.rand(b, n) > 0.2)

    batched = batched_knn_for_iterations(preds, pca, va, pcb, vb, cfg)
    for it, pred in enumerate(preds):
        for t in sorted(knn_flow_types(cfg)):
            w_ref, d_ref = flow_knn(
                pca, va, pcb, vb, getattr(pred, f"{t}_flow"), cfg.knn_chunk
            )
            l_ref = nearest_point_loss(cfg.knn, cfg.bev_extent, w_ref,
                                       d_ref, va)
            np.testing.assert_allclose(
                np.asarray(batched[it][t]["dist_sqr"]), np.asarray(d_ref),
                rtol=0, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(batched[it][t]["loss"]), np.asarray(l_ref),
                rtol=1e-6, atol=1e-6,
            )


def test_movavg_batched_matches_sequential():
    """movavg_update_batched (one histogram pass for all iterations) must
    equal sequential movavg_update calls — unsupervised and supervised."""
    import numpy as np

    from liso_tpu.models.slim import (
        movavg_init, movavg_update, movavg_update_batched, movavg_value,
    )

    rng = np.random.RandomState(0)
    n_iter, m = 4, 2048
    es = jnp.asarray(rng.uniform(0, 2, (n_iter, m)).astype(np.float32))
    ed = jnp.asarray(rng.uniform(0, 2, (n_iter, m)).astype(np.float32))
    dyn = jnp.asarray(rng.uniform(0, 1, (n_iter, m)).astype(np.float32))
    valid = jnp.asarray(rng.rand(n_iter, m) > 0.3)
    mov = jnp.asarray(rng.rand(n_iter, m) > 0.5)

    for supervised in (False, True):
        seq = movavg_init(10, num_still=777 if supervised else None)
        for i in range(n_iter):
            seq = movavg_update(
                seq, es[i], ed[i], dyn[i], valid[i],
                moving_mask=mov[i] if supervised else None,
            )
        bat = movavg_init(10, num_still=777 if supervised else None)
        bat = movavg_update_batched(
            bat, es, ed, dyn, valid, moving_mask=mov if supervised else None
        )
        np.testing.assert_allclose(
            np.asarray(seq.importance), np.asarray(bat.importance),
            rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            float(seq.bias_counter), float(bat.bias_counter), rtol=1e-6
        )
        assert float(seq.moving_counter) == float(bat.moving_counter)
        assert float(seq.still_counter) == float(bat.still_counter)
        np.testing.assert_allclose(
            float(movavg_value(seq)), float(movavg_value(bat)), rtol=1e-6
        )
