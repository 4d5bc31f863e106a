"""SLIM scene-flow model: pillar encoder + bidirectional RAFT + decoder.

Behavioral reference: liso/slim/model/slim.py:10-156 and
liso/slim/slim_loss/movavg_cls_threshold.py:9-157. The reference's
`MovingAverageThreshold` lives in registered torch buffers mutated in-place
during the loss; here it is an explicit functional state pytree carried in
the train state (updated with jnp ops, checkpointed with everything else).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from liso_tpu.models.pillar_encoder import PillarEncoder
from liso_tpu.models.raft import RAFT
from liso_tpu.ops.bev import BevSetup


# ---------------------------------------------------------------------------
# Moving-average dynamicness threshold (functional)
# ---------------------------------------------------------------------------
class MovAvgState(NamedTuple):
    importance: jnp.ndarray  # [resolution] float32 EMA of improvement hist
    bias_counter: jnp.ndarray  # scalar float64-ish (float32 ok)
    update_weight: jnp.ndarray  # scalar constant
    start_value: jnp.ndarray  # scalar
    # supervised mode (num_still set): running class counters that weight
    # improvements by 1/count (movavg_cls_threshold.py:40-48, 79-90);
    # both 0 in the unsupervised mode
    moving_counter: jnp.ndarray = jnp.zeros((), jnp.float32)
    still_counter: jnp.ndarray = jnp.zeros((), jnp.float32)


def movavg_init(
    num_train_samples: int,
    num_moving: int = 621_013_971,
    num_still: Optional[int] = None,
    resolution: int = 100_000,
    start_value: float = 0.5,
) -> MovAvgState:
    """movavg_cls_threshold.py:__init__ — update weight such that the buffer
    turns over roughly every 5k iterations."""
    total = num_moving + (num_still or 0)
    avg_points_per_sample = total / max(num_train_samples, 1)
    update_weight = 1.0 / min(2.0 * total, 5_000.0 * avg_points_per_sample)
    return MovAvgState(
        importance=jnp.zeros((resolution,), jnp.float32),
        bias_counter=jnp.zeros((), jnp.float32),
        update_weight=jnp.asarray(update_weight, jnp.float32),
        start_value=jnp.asarray(start_value, jnp.float32),
        moving_counter=jnp.asarray(float(num_moving if num_still else 0)),
        still_counter=jnp.asarray(float(num_still or 0)),
    )


def movavg_value(state: MovAvgState) -> jnp.ndarray:
    """Optimal threshold = bin minimising cumulative improvement
    (movavg_cls_threshold.py:92-111); start value until first update."""
    res = state.importance.shape[0]
    improv = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(state.importance)]
    )
    best = jnp.min(improv)
    is_best = improv == best
    idxs = jnp.arange(res + 1, dtype=jnp.float32)
    avg_idx = (idxs * is_best).sum() / jnp.maximum(is_best.sum(), 1)
    optimal = avg_idx / res
    return jnp.where(state.bias_counter > 0.0, optimal, state.start_value)


def movavg_update(
    state: MovAvgState,
    epes_stat: jnp.ndarray,  # [M] flattened
    epes_dyn: jnp.ndarray,  # [M]
    dynamicness: jnp.ndarray,  # [M]
    valid: jnp.ndarray,  # [M] bool
    moving_mask: Optional[jnp.ndarray] = None,  # [M] supervised mode only
) -> MovAvgState:
    """movavg_cls_threshold.py:113-157 (improvements = epe_static -
    epe_dynamic, scattered into dynamicness bins, EMA'd; supervised mode
    weights by the running inverse class counts). Invalid entries contribute
    zero and don't count toward the bias update."""
    res = state.importance.shape[0]
    improvements = jnp.where(valid, epes_stat - epes_dyn, 0.0)
    if moving_mask is not None:  # supervised: 1/count class weighting
        w = 1.0 / jnp.maximum(
            jnp.where(moving_mask, state.moving_counter, state.still_counter),
            1.0,
        )
        improvements = improvements * w
        state = state._replace(
            moving_counter=state.moving_counter
            + (moving_mask & valid).sum(),
            still_counter=state.still_counter
            + (~moving_mask & valid).sum(),
        )
    bins = jnp.clip((dynamicness * res).astype(jnp.int32), 0, res - 1)
    bins = jnp.where(valid, bins, res)  # drop bucket
    if jax.default_backend() == "tpu":
        # XLA scatter-add serializes on TPU (~150 ms per call at 393k
        # points x 100k bins, and this runs once per RAFT iteration):
        # sort + MXU one-hot scatter instead (grid_scatter_pallas).
        from liso_tpu.ops.grid_scatter_pallas import grid_reduce

        res_pad = -(-res // 2048) * 2048
        bins_s, vals_s = jax.lax.sort(
            [bins, improvements], dimension=0, num_keys=1
        )
        bins_s = jnp.where(  # drop bucket: past every grid tile
            bins_s >= res, jnp.iinfo(jnp.int32).max, bins_s
        )
        hist = grid_reduce(
            vals_s[None, :, None], bins_s[None], res_pad, "add"
        )[0, :res, 0]
    else:
        hist = jax.ops.segment_sum(
            improvements, bins, num_segments=res + 1
        )[:res]
    count = valid.sum().astype(jnp.float32)
    # (1 - uw)^count via expm1/log1p: the reference keeps these buffers in
    # float64 because uw ~ 1e-9 vanishes in fp32; this form is fp32-exact
    one_minus_cur_w = -jnp.expm1(count * jnp.log1p(-state.update_weight))
    cur_w = 1.0 - one_minus_cur_w
    importance = state.importance * cur_w + one_minus_cur_w * hist
    bias = state.bias_counter * cur_w + one_minus_cur_w
    return state._replace(importance=importance, bias_counter=bias)


def movavg_update_batched(
    state: MovAvgState,
    epes_stat: jnp.ndarray,  # [I, M] one row per RAFT iteration
    epes_dyn: jnp.ndarray,  # [I, M]
    dynamicness: jnp.ndarray,  # [I, M]
    valid: jnp.ndarray,  # [I, M] bool
    moving_mask: Optional[jnp.ndarray] = None,  # [I, M] supervised mode
) -> MovAvgState:
    """Sequence of movavg_update calls (one per row) with ONE batched
    histogram pass: the sort + MXU scatter run once over [I, M] instead of
    I times, and the EMA folds sequentially afterwards. Exact: the
    supervised per-row class counters only change by per-row increments
    that are known upfront (valid/moving are row-local), so the 1/count
    weights equal the sequential ones."""
    res = state.importance.shape[0]
    n_iter = epes_stat.shape[0]
    improvements = jnp.where(valid, epes_stat - epes_dyn, 0.0)
    if moving_mask is not None:
        mov_inc = (moving_mask & valid).sum(axis=-1).astype(jnp.float32)
        still_inc = (~moving_mask & valid).sum(axis=-1).astype(jnp.float32)
        mov_before = state.moving_counter + jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(mov_inc)[:-1]]
        )
        still_before = state.still_counter + jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(still_inc)[:-1]]
        )
        w = 1.0 / jnp.maximum(
            jnp.where(
                moving_mask, mov_before[:, None], still_before[:, None]
            ),
            1.0,
        )
        improvements = improvements * w
        state = state._replace(
            moving_counter=state.moving_counter + mov_inc.sum(),
            still_counter=state.still_counter + still_inc.sum(),
        )
    bins = jnp.clip((dynamicness * res).astype(jnp.int32), 0, res - 1)
    bins = jnp.where(valid, bins, res)
    if jax.default_backend() == "tpu":
        from liso_tpu.ops.grid_scatter_pallas import grid_reduce

        res_pad = -(-res // 2048) * 2048
        bins_s, vals_s = jax.lax.sort(
            [bins, improvements], dimension=-1, num_keys=1
        )
        bins_s = jnp.where(
            bins_s >= res, jnp.iinfo(jnp.int32).max, bins_s
        )
        hists = grid_reduce(
            vals_s[..., None], bins_s, res_pad, "add"
        )[:, :res, 0]
    else:
        hists = jax.vmap(
            lambda imp, b: jax.ops.segment_sum(
                imp, b, num_segments=res + 1
            )[:res]
        )(improvements, bins)
    importance, bias = state.importance, state.bias_counter
    for i in range(n_iter):
        count = valid[i].sum().astype(jnp.float32)
        one_minus_cur_w = -jnp.expm1(
            count * jnp.log1p(-state.update_weight)
        )
        cur_w = 1.0 - one_minus_cur_w
        importance = importance * cur_w + one_minus_cur_w * hists[i]
        bias = bias * cur_w + one_minus_cur_w
    return state._replace(importance=importance, bias_counter=bias)


# ---------------------------------------------------------------------------
class SlimModel(nn.Module):
    """Forward+backward RAFT over a BEV pillar encoding.

    __call__(pcl_t0, valid_t0, pcl_t1, valid_t1) returns
    (outputs_fw, outputs_bw, occ_t0, occ_t1) where outputs_* are
    [iters, B, H, W, 8(+1)] stacked per-iteration network outputs (decoding
    happens outside, per iteration, as in slim.py:76-142).
    The forward and backward directions share one RAFT (fnet/cnet/update
    weights) exactly like the reference, which calls the same
    `predict_single_flow_map_and_classes` with swapped feature maps
    (raft_mod.py:113-124); only the head decoders differ, and those are
    parameter-free here.
    """

    bev: BevSetup
    num_iters: int = 6
    corr_levels: int = 4
    corr_radius: int = 3
    pillar_channels: int = 64
    fnet_norm: str = "instance_affine"
    predict_weight_for_static_aggregation: bool = False
    compute_dtype: object = None  # jnp.bfloat16 for mixed precision

    def setup(self):
        self.pillar_encoder = PillarEncoder(
            self.bev, num_channels=self.pillar_channels
        )
        self.raft = RAFT(
            num_iters=self.num_iters,
            corr_levels=self.corr_levels,
            corr_radius=self.corr_radius,
            resolution_m=self.bev.res_m[0],
            fnet_norm=self.fnet_norm,
            predict_weight_for_static_aggregation=(
                self.predict_weight_for_static_aggregation is not False
            ),
            dtype=self.compute_dtype,
        )

    def encode_frame(
        self, pcl, valid, train: bool = False, prepared=None,
        pillar_image=None,
    ):
        """Streaming entry: encode ONE frame once; callers cache the
        returned (fmap, cnet) across steps (apply with
        method=SlimModel.encode_frame). `prepared` (from
        pillar_encoder.prepare_pillar_inputs) skips the parameter-free
        pillar prep when the detector shares the same cloud;
        `pillar_image` = (img, occ) skips the pillar encoder entirely
        (the fused-step caller scatters SLIM's and the detector's point
        features in one kernel call, pillar_encoder.fused_scatter_images)."""
        if pillar_image is not None:
            img, occ = pillar_image
        else:
            img, occ = self.pillar_encoder(
                pcl, valid, train=train, prepared=prepared
            )
        fmap, cn = self.raft.encode(img)
        return fmap, cn, occ[..., 0]

    def pillar_point_feats(
        self, pcl, valid, train: bool = False, prepared=None
    ):
        """Pre-scatter per-point PFN features (x [B, N, C], prepared) for
        fused multi-encoder scattering (pillar_encoder.fused_scatter_images)."""
        return self.pillar_encoder.point_feats(
            pcl, valid, train=train, prepared=prepared
        )

    def flow_from_features(self, fmap0, cn0, fmap1, upsample_all=False):
        """Streaming entry: flow frame0 -> frame1 from cached features."""
        return self.raft.flow_from_features(
            fmap0, cn0, fmap1, upsample_all=upsample_all
        )

    def __call__(
        self,
        pcl_t0: jnp.ndarray,
        valid_t0: jnp.ndarray,
        pcl_t1: jnp.ndarray,
        valid_t1: jnp.ndarray,
        train: bool = False,
        backward: bool = True,
        upsample_all: bool = True,
    ):
        img0, occ0 = self.pillar_encoder(pcl_t0, valid_t0, train=train)
        img1, occ1 = self.pillar_encoder(pcl_t1, valid_t1, train=train)
        outputs_fw = self.raft(img0, img1, upsample_all=upsample_all)
        outputs_bw = (
            self.raft(img1, img0, upsample_all=upsample_all)
            if backward
            else None
        )
        return outputs_fw, outputs_bw, occ0[..., 0], occ1[..., 0]
