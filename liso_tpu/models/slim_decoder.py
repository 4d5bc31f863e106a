"""SLIM head decoder, TPU-native.

Behavioral reference: liso/slim/model/head_decoder.py:30-955 and
liso/slim/slim_loss/static_aggregation.py:34-110. Decodes the concatenated
RAFT output [B, H, W, 8(+1)] into class probabilities, static/dynamic/
aggregated flows and the static-aggregation rigid transform, then gathers
everything to points.

TPU deltas: the static aggregation runs the batched differentiable Kabsch
(liso_tpu.ops.kabsch) via vmap instead of a Python loop over the batch with
float64 SVD; all switches of the reference's `output_modification` config are
reproduced; everything is channels-last and jit-able.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from liso_tpu.ops import kabsch as kab

OFF_LOGIT = -100.0
ON_LOGIT = 100.0


class OutputModification(NamedTuple):
    """reference cfg.SLIM.model.output_modification (liso_config.yml:303-310).

    Values: 'net' | 'zero' | 'gt' (flows); 'net' | True | False |
    'gt_label_based' | 'gt_flow_based' (logits)."""

    disappearing_logit: object = False
    static_logit: object = "net"
    dynamic_logit: object = "net"
    ground_logit: object = False
    static_flow: str = "net"
    dynamic_flow: str = "net"
    dynamic_flow_grad_scale: float = 1.0


class DecoderCfg(NamedTuple):
    output_modification: OutputModification = OutputModification()
    predict_weight_for_static_aggregation: object = False  # False|'sigmoid'|'softmax'
    use_static_aggr_flow_for_aggr_flow: bool = False
    dynamic_flow_is_non_rigid_flow: bool = False
    use_eps_for_weighted_pc_alignment: bool = False


class SlimPrediction(NamedTuple):
    """Pointwise (per-point) decoded prediction + dense maps + trafo.

    Field names follow the reference HeadDecoder retval Munch
    (head_decoder.py:565-580)."""

    staticness: jnp.ndarray  # [B, N]
    dynamicness: jnp.ndarray  # [B, N]
    groundness: jnp.ndarray  # [B, N]
    is_static: jnp.ndarray  # [B, N] bool
    is_dynamic: jnp.ndarray
    is_ground: jnp.ndarray
    static_flow: jnp.ndarray  # [B, N, 3]
    dynamic_flow: jnp.ndarray
    aggregated_flow: jnp.ndarray
    static_aggr_flow: jnp.ndarray
    static_aggr_trafo: jnp.ndarray  # [B, 4, 4]
    not_enough_points: jnp.ndarray  # [B] bool
    dynamicness_threshold: jnp.ndarray  # scalar
    bev_aggregated_flow: jnp.ndarray  # [B, H, W, 3]
    bev_static_flow: jnp.ndarray  # [B, H, W, 3]
    bev_dynamicness: jnp.ndarray  # [B, H, W]
    bev_staticness: jnp.ndarray  # [B, H, W]
    bev_groundness: jnp.ndarray  # [B, H, W]
    bev_dynamic_flow: jnp.ndarray  # [B, H, W, 3]


def scale_gradient(x: jnp.ndarray, scaling: float) -> jnp.ndarray:
    """head_decoder.py:scale_gradient — identity fwd, scaled bwd."""
    if scaling == 1.0:
        return x
    if scaling == 0.0:
        return jax.lax.stop_gradient(x)
    return x * scaling - jax.lax.stop_gradient(x) * (scaling - 1.0)


def normalized_sigmoid_sum(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid(x_i)/sum_j sigmoid(x_j) over masked entries
    (reference slim_loss/numerical_stability.py:27-53). logits [..., M]."""
    neg_part = -jax.nn.relu(-logits)
    weights = jax.nn.sigmoid(jnp.abs(logits))
    # max-exp trick over masked entries
    min_exp = jnp.min(neg_part, axis=-1, keepdims=True)
    exps = jnp.where(mask, neg_part, min_exp)
    w = weights * mask
    max_exp = jnp.max(exps, axis=-1, keepdims=True)
    denom = (jnp.exp(exps - max_exp) * w).sum(axis=-1, keepdims=True)
    denom = jnp.where(denom <= 0, jnp.ones_like(denom), denom)
    return jnp.exp(jnp.where(mask, neg_part, max_exp) - max_exp) * w / denom


def gather_grid_to_points(
    grid: jnp.ndarray, rowcol: jnp.ndarray, valid: jnp.ndarray, default=0.0,
    sorted_cells: jnp.ndarray = None,
):
    """grid [B, H, W, C], rowcol int [B, N, 2] -> [B, N, C] (reference
    static_aggregation.batched_grid_data_to_pointwise_data).

    When `sorted_cells` (ascending flat cell ids, drop-bucket >= H*W for
    invalid/out-of-range points) is given and we are on TPU, the MXU
    sorted-cell gather kernel is used — the SlimTrainer pre-sorts every
    cloud by BEV cell so the decoder's points arrive in that order (XLA row
    gathers serialize on TPU). Out-of-range points then read 0 instead of
    the reference's edge-clamped cell; they are outside the loss FoV mask
    either way (knn_wrapper.py:58-135)."""
    h, w = grid.shape[1:3]

    # NOTE: measured SLOWER than the XLA gather here (the kernel's ~5 ms
    # fixed cost x 60 small gathers per step); keep the plumbing, gate off
    if False and sorted_cells is not None and jax.default_backend() == "tpu":
        from liso_tpu.ops.grid_scatter_pallas import grid_gather

        sq = grid.dtype == jnp.float32 and grid.shape[-1] <= 8
        vals = grid_gather(
            grid.reshape(grid.shape[0], h * w, -1), sorted_cells, False, sq
        )
        if default != 0.0:
            vals = jnp.where(valid[..., None], vals, default)
        return vals

    r = jnp.clip(rowcol[..., 0], 0, h - 1)
    c = jnp.clip(rowcol[..., 1], 0, w - 1)

    def per_sample(g, ri, ci):
        return g[ri, ci]

    vals = jax.vmap(per_sample)(grid, r, c)
    return jnp.where(valid[..., None], vals, default)


def gt_static_flow_from_odom(
    inv_odom: jnp.ndarray, voxel_center_xy: jnp.ndarray
) -> jnp.ndarray:
    """BEV flow of static world under ego motion: (inv_odom - I) applied to
    voxel centers (head_decoder.py:124-155). inv_odom [B, 4, 4],
    voxel_center_xy [H, W, 2] -> [B, H, W, 2]."""
    hom = jnp.concatenate(
        [
            voxel_center_xy,
            jnp.zeros_like(voxel_center_xy[..., :1]),
            jnp.ones_like(voxel_center_xy[..., :1]),
        ],
        axis=-1,
    )  # [H, W, 4]
    delta = inv_odom[:, :2, :] - jnp.eye(2, 4, dtype=inv_odom.dtype)[None]
    return jnp.einsum("bij,hwj->bhwi", delta, hom)


def _resolve_logit(mode, net_val, others, ones, gt_val=None):
    """Reproduce artificial_logit_network_output's switch for one logit
    channel (head_decoder.py:779-953). `others` = list of the other two logit
    maps (used by the True/False detach-max/min semantics)."""
    if mode == "net":
        return net_val
    if mode is True:
        m = jax.lax.stop_gradient(
            jnp.max(jnp.stack([jnp.max(o) for o in others]))
        )
        return m + ON_LOGIT * ones
    if mode is False:
        m = jax.lax.stop_gradient(
            jnp.min(jnp.stack([jnp.min(o) for o in others]))
        )
        return m + OFF_LOGIT * ones
    if mode in ("gt_label_based", "gt_flow_based"):
        assert gt_val is not None, mode
        return gt_val
    raise ValueError(f"unknown logit mode {mode}")


def decode(
    network_output: jnp.ndarray,
    dynamicness_threshold: jnp.ndarray,
    *,
    cfg: DecoderCfg,
    pc: jnp.ndarray,  # [B, N, >=3]
    rowcol: jnp.ndarray,  # [B, N, 2] int (full-res pillar coords)
    point_cells: jnp.ndarray = None,  # [B, N] ascending flat cells (sorted
    # clouds; enables the TPU gather kernel)
    point_valid: jnp.ndarray,  # [B, N] bool
    filled_pillar_mask: jnp.ndarray,  # [B, H, W] bool
    inv_odom: jnp.ndarray,  # [B, 4, 4] odometry of the *other* direction
    voxel_center_xy: np.ndarray,  # [H, W, 2] metric cell centers
    gt_flow_bev: Optional[jnp.ndarray] = None,  # [B, H, W, 2]
    ohe_gt_labels_bev: Optional[jnp.ndarray] = None,  # [B, H, W, 3] bool
    overwrite_non_filled_pillars_with_default_flow: bool = True,
    overwrite_non_filled_pillars_with_default_logits: bool = True,
) -> SlimPrediction:
    om = cfg.output_modification
    fp = filled_pillar_mask[..., None]

    out = network_output
    if cfg.predict_weight_for_static_aggregation is not False:
        weight_logits = out[..., -1]
        out = out[..., :-1]
    else:
        weight_logits = None
    assert out.shape[-1] == 8, out.shape
    disappearing_logit = out[..., 0:1]
    static_logit = out[..., 1:2]
    dynamic_logit = out[..., 2:3]
    ground_logit = out[..., 3:4]
    static_flow = out[..., 4:6]
    dynamic_flow = out[..., 6:8]

    vc = jnp.asarray(voxel_center_xy, jnp.float32)
    gt_static_flow = gt_static_flow_from_odom(inv_odom, vc)

    # --- artificial flow modification (head_decoder.py:735-777)
    if om.static_flow == "gt":
        static_flow = gt_static_flow
    elif om.static_flow == "zero":
        static_flow = jnp.zeros_like(static_flow)
    else:
        assert om.static_flow == "net", om.static_flow
    if om.dynamic_flow == "gt":
        assert gt_flow_bev is not None
        dynamic_flow = gt_flow_bev
        if cfg.dynamic_flow_is_non_rigid_flow:
            dynamic_flow = dynamic_flow - static_flow
    elif om.dynamic_flow == "zero":
        dynamic_flow = jnp.zeros_like(dynamic_flow)
    else:
        assert om.dynamic_flow == "net", om.dynamic_flow
    dynamic_flow = scale_gradient(dynamic_flow, om.dynamic_flow_grad_scale)

    # --- artificial logit modification (head_decoder.py:779-953)
    ones = jnp.ones_like(static_logit)
    gt_static_l = gt_dynamic_l = gt_ground_l = None
    if om.static_logit == "gt_label_based":
        if om.ground_logit is False:
            gt_stat = ohe_gt_labels_bev[..., 0:1] | ohe_gt_labels_bev[..., 2:3]
            gt_static_l = ON_LOGIT * (gt_stat.astype(jnp.float32) - 1.0)
        else:
            gt_static_l = ON_LOGIT * (
                ohe_gt_labels_bev[..., 0:1].astype(jnp.float32) - 1.0
            )
    elif om.static_logit == "gt_flow_based":
        norig = gt_flow_bev - gt_static_flow
        is_stat = (
            jnp.linalg.norm(norig, axis=-1, keepdims=True) <= 0.05
        ).astype(jnp.float32)
        gt_static_l = ON_LOGIT * (is_stat - 1.0)
    if om.dynamic_logit == "gt_label_based":
        gt_dynamic_l = ON_LOGIT * (
            ohe_gt_labels_bev[..., 1:2].astype(jnp.float32) - 1.0
        )
    elif om.dynamic_logit == "gt_flow_based":
        gt_dynamic_l = ON_LOGIT - gt_static_l
    if om.ground_logit == "gt_label_based":
        gt_ground_l = ON_LOGIT * (
            ohe_gt_labels_bev[..., 2:3].astype(jnp.float32) - 1.0
        )

    if om.disappearing_logit is True:
        disappearing_logit = jnp.zeros_like(disappearing_logit)
    elif om.disappearing_logit is False:
        disappearing_logit = OFF_LOGIT * ones
    else:
        assert om.disappearing_logit == "net"

    static_logit = _resolve_logit(
        om.static_logit, static_logit, [dynamic_logit, ground_logit], ones, gt_static_l
    )
    dynamic_logit = _resolve_logit(
        om.dynamic_logit, dynamic_logit, [static_logit, ground_logit], ones,
        gt_dynamic_l,
    )
    ground_logit = _resolve_logit(
        om.ground_logit, ground_logit, [static_logit, dynamic_logit], ones,
        gt_ground_l,
    )

    # --- default values in non-filled pillars (head_decoder.py:566-609)
    if overwrite_non_filled_pillars_with_default_logits:
        disappearing_logit = jnp.where(fp, disappearing_logit, OFF_LOGIT)
        static_logit = jnp.where(
            fp, static_logit, OFF_LOGIT if om.static_logit is False else 0.0
        )
        dynamic_logit = jnp.where(
            fp, dynamic_logit, 0.0 if om.dynamic_logit is True else OFF_LOGIT
        )
        ground_logit = jnp.where(
            fp, ground_logit, 0.0 if om.ground_logit is True else OFF_LOGIT
        )
    if overwrite_non_filled_pillars_with_default_flow:
        static_flow = jnp.where(fp, static_flow, 0.0)
        dynamic_flow = jnp.where(fp, dynamic_flow, 0.0)

    # --- class probabilities (head_decoder.py:612-634)
    class_logits = jnp.concatenate([static_logit, dynamic_logit, ground_logit], -1)
    class_probs = jax.nn.softmax(class_logits, axis=-1)
    staticness = class_probs[..., 0]
    dynamicness = class_probs[..., 1]
    groundness = class_probs[..., 2]
    is_dynamic = dynamicness >= dynamicness_threshold
    is_static = (staticness >= groundness) & (~is_dynamic)
    is_ground = ~(is_static | is_dynamic)

    # --- static aggregation (head_decoder.py:636-705 + static_aggregation.py)
    aggr_weight = staticness * filled_pillar_mask.astype(jnp.float32)
    if cfg.predict_weight_for_static_aggregation is not False:
        mode = cfg.predict_weight_for_static_aggregation
        b, h, w = weight_logits.shape
        flat = weight_logits.reshape(b, h * w)
        flat_mask = filled_pillar_mask.reshape(b, h * w)
        if mode == "softmax":
            masked = jnp.where(
                flat_mask, flat, jnp.min(flat) - 1000.0
            )
            wmap = jax.nn.softmax(masked, axis=-1).reshape(b, h, w)
        else:
            assert mode == "sigmoid", mode
            wmap = normalized_sigmoid_sum(flat, flat_mask).reshape(b, h, w)
        aggr_weight = aggr_weight * wmap

    pointwise_static_flow2 = gather_grid_to_points(
        static_flow, rowcol, point_valid, sorted_cells=point_cells
    )
    pointwise_staticness_w = gather_grid_to_points(
        aggr_weight[..., None], rowcol, point_valid, sorted_cells=point_cells
    )[..., 0]
    pts3 = jnp.where(point_valid[..., None], pc[..., :3], 0.0)
    flow3 = jnp.concatenate(
        [pointwise_static_flow2, jnp.zeros_like(pointwise_static_flow2[..., :1])], -1
    )
    w = jnp.where(point_valid, pointwise_staticness_w, 0.0)
    static_aggr_trafo, not_enough_points = kab.weighted_kabsch(
        pts3,
        pts3 + flow3,
        w,
        use_epsilon_on_weights=cfg.use_eps_for_weighted_pc_alignment,
    )
    # rigid BEV flow of the aggregated transform at voxel centers
    grid_h = jnp.concatenate(
        [vc, jnp.zeros_like(vc[..., :1]), jnp.ones_like(vc[..., :1])], -1
    )
    static_aggr_flow = jnp.einsum(
        "bij,hwj->bhwi",
        static_aggr_trafo[:, :2, :] - jnp.eye(2, 4, dtype=jnp.float32)[None],
        grid_h,
    )
    masked_static_aggr_flow = jnp.where(fp, static_aggr_flow, 0.0)

    # --- aggregate flow maps, lift to 3d (head_decoder.py:206-268)
    def lift(f):
        return jnp.concatenate([f, jnp.zeros_like(f[..., :1])], axis=-1)

    static_flow3 = lift(static_flow)
    dynamic_flow3 = lift(dynamic_flow)
    static_aggr_flow3 = lift(static_aggr_flow)
    masked_static_aggr_flow3 = lift(masked_static_aggr_flow)

    if cfg.use_static_aggr_flow_for_aggr_flow:
        static_for_aggr = masked_static_aggr_flow3
    else:
        static_for_aggr = static_flow3
    if cfg.dynamic_flow_is_non_rigid_flow:
        dyn_branch = (static_for_aggr + dynamic_flow3) * (
            1.0 - groundness[..., None]
        )
    else:
        dyn_branch = dynamic_flow3 * (1.0 - groundness[..., None])
    aggregated_flow = jnp.where(is_static[..., None], static_for_aggr, dyn_branch)

    # --- gather to points (head_decoder.py:300-408)
    flt = jnp.concatenate(
        [
            staticness[..., None],
            dynamicness[..., None],
            groundness[..., None],
            dynamic_flow3,
            static_flow3,
            aggregated_flow,
            static_aggr_flow3,
        ],
        axis=-1,
    )
    pw_flt = gather_grid_to_points(flt, rowcol, point_valid)
    bools = jnp.stack([is_static, is_dynamic, is_ground], axis=-1)
    pw_bool = gather_grid_to_points(bools, rowcol, point_valid, default=0) > 0

    return SlimPrediction(
        staticness=pw_flt[..., 0],
        dynamicness=pw_flt[..., 1],
        groundness=pw_flt[..., 2],
        is_static=pw_bool[..., 0],
        is_dynamic=pw_bool[..., 1],
        is_ground=pw_bool[..., 2],
        dynamic_flow=pw_flt[..., 3:6],
        static_flow=pw_flt[..., 6:9],
        aggregated_flow=pw_flt[..., 9:12],
        static_aggr_flow=pw_flt[..., 12:15],
        static_aggr_trafo=static_aggr_trafo,
        not_enough_points=not_enough_points,
        dynamicness_threshold=dynamicness_threshold,
        bev_aggregated_flow=aggregated_flow,
        bev_static_flow=static_flow3,
        bev_dynamicness=dynamicness,
        bev_staticness=staticness,
        bev_groundness=groundness,
        bev_dynamic_flow=dynamic_flow3,
    )
