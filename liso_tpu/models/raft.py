"""RAFT-small BEV scene-flow backbone, TPU-native flax rebuild.

Behavioral reference: liso/slim/model/{raft_mod.py:19-257, extractor.py:211-297,
update.py:23-164, raft_code/corr.py:6-56, raft_code/utils.py:5-47}. Design
deltas for TPU:

  * channels-last [B, H, W, C] end to end (no NCHW permutes);
  * the correlation pyramid is built as one batched MXU matmul per level
    against a 2x2-pooled fmap1 (linear in fmap1 == the reference's volume
    pooling, without streaming the 268 MB volume); on TPU the volume is cast
    to bf16 once per flow pass and per-iteration window lookups run as
    batched one-hot MXU matmuls (ops/corr_lookup_mm.py); elsewhere they are
    contiguous-window bilinear gathers per level (radius 3), not grid_sample;
  * coords use a single (row, col) pixel convention; the reference flips
    between (x, y) RAFT convention and (row, col) "usfl" convention at the
    boundary (raft_mod.change_flow_convention_from_raft2usfl) — here flow is
    (row, col) pixels internally and (x, y) meters at the output, which is the
    same mapping because BEV rows <-> x and cols <-> y with equal resolution;
  * the 6 GRU iterations run under lax.scan with shared weights;
    stop_gradient between iterations replicates the reference's detach().
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _norm(kind: str, name: str, dtype=None):
    # dtype = compute/output dtype (bf16 in mixed precision); flax GroupNorm
    # always accumulates mean/var in fp32 internally, so only the normalize/
    # affine arithmetic and — crucially — the HBM round-trip of the
    # activations drop to bf16 (the norms sit between bf16 convs; emitting
    # fp32 doubled the bandwidth of every stage boundary).
    if kind == "instance_affine":
        return lambda c: nn.GroupNorm(
            num_groups=None, group_size=1, epsilon=1e-3, dtype=dtype,
            name=name
        )
    if kind == "instance":
        return lambda c: nn.GroupNorm(
            num_groups=None,
            group_size=1,
            epsilon=1e-5,
            use_bias=False,
            use_scale=False,
            dtype=dtype,
            name=name,
        )
    if kind == "group":
        return lambda c: nn.GroupNorm(num_groups=c // 8, dtype=dtype,
                                      name=name)
    if kind == "none":
        return lambda c: (lambda x: x)
    raise ValueError(f"unknown norm {kind}")


class ResidualBlock(nn.Module):
    """extractor.py:ResidualBlock — two 3x3 convs + skip (1x1 when shape
    changes).

    torch_compat replicates two reference quirks for checkpoint porting:
    explicit symmetric (torch-aligned) padding on strided convs (XLA SAME
    pads left-short where torch pads right-short) and the redundant 1x1
    downsample the reference builds on the SECOND block of every stage
    (dummy_in_filters quirk, extractor.py:19-21) via force_down."""

    filters: int
    stride: int = 1
    norm_fn: str = "instance_affine"
    dtype: object = None  # bf16 compute when set (params stay fp32)
    torch_compat: bool = False
    force_down: bool = False

    @nn.compact
    def __call__(self, x):
        pad3 = ((1, 1), (1, 1)) if self.torch_compat else "SAME"
        y = nn.Conv(self.filters, (3, 3), strides=self.stride,
                    padding=pad3, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_norm(self.norm_fn, "norm1", self.dtype)(self.filters)(y))
        y = nn.Conv(self.filters, (3, 3), padding=pad3,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_norm(self.norm_fn, "norm2", self.dtype)(self.filters)(y))
        if (
            self.stride != 1
            or x.shape[-1] != self.filters
            or (self.force_down and self.torch_compat)
        ):
            x = nn.Conv(self.filters, (1, 1), strides=self.stride,
                        dtype=self.dtype, name="down")(x)
            x = _norm(self.norm_fn, "norm3", self.dtype)(self.filters)(x)
        return nn.relu(x + y)


class SmallEncoder(nn.Module):
    """extractor.py:SmallEncoder — 7x7/2 stem then 3 residual stages
    (32, 64/2, 96/2) and a 1x1 head; total stride 8. torch_compat=True
    makes the layout weight-compatible with reference checkpoints
    (tests/test_reference_metric_parity.py converts and compares)."""

    output_dim: int = 128
    norm_fn: str = "instance_affine"
    dtype: object = None
    torch_compat: bool = False

    @nn.compact
    def __call__(self, x):
        tc = self.torch_compat
        pad7 = ((3, 3), (3, 3)) if tc else "SAME"
        x = nn.Conv(32, (7, 7), strides=2, padding=pad7,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_norm(self.norm_fn, "norm1", self.dtype)(32)(x))
        rb = lambda f, s, name, force=False: ResidualBlock(
            f, s, self.norm_fn, self.dtype, torch_compat=tc,
            force_down=force, name=name,
        )
        x = rb(32, 1, "layer1a")(x)
        x = rb(32, 1, "layer1b")(x)
        x = rb(64, 2, "layer2a")(x)
        x = rb(64, 1, "layer2b", force=True)(x)
        x = rb(96, 2, "layer3a")(x)
        x = rb(96, 1, "layer3b", force=True)(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)
        return x.astype(jnp.float32)


class JointEncoder(nn.Module):
    """fnet + cnet fused into ONE residual tower with two 1x1 output heads.

    TPU-first redesign (not in the reference, which runs twin SmallEncoder
    towers, extractor.py:211): on this hardware conv cost at the encoder
    resolutions is dominated by per-op overhead, not FLOPs — so running
    2x26 narrow convs costs ~2x one 26-conv tower of comparable width.
    The shared trunk carries the union capacity (48/96/144 vs 2x 32/64/96)
    and the fmap/context splits are cheap 1x1 heads. RAFT(joint_encoders=
    False) restores the reference twin-tower layout exactly."""

    fmap_dim: int = 128
    ctx_dim: int = 160  # hidden_dim + context_dim
    norm_fn: str = "instance_affine"
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(48, (7, 7), strides=2, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_norm(self.norm_fn, "norm1", self.dtype)(48)(x))
        x = ResidualBlock(48, 1, self.norm_fn, self.dtype, name="layer1a")(x)
        x = ResidualBlock(48, 1, self.norm_fn, self.dtype, name="layer1b")(x)
        x = ResidualBlock(96, 2, self.norm_fn, self.dtype, name="layer2a")(x)
        x = ResidualBlock(96, 1, self.norm_fn, self.dtype, name="layer2b")(x)
        x = ResidualBlock(144, 2, self.norm_fn, self.dtype, name="layer3a")(x)
        x = ResidualBlock(144, 1, self.norm_fn, self.dtype, name="layer3b")(x)
        fmap = nn.Conv(
            self.fmap_dim, (1, 1), dtype=self.dtype, name="fmap_head"
        )(x)
        ctx = nn.Conv(self.ctx_dim, (1, 1), dtype=self.dtype, name="ctx_head")(x)
        return fmap.astype(jnp.float32), ctx.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Correlation pyramid (raft_code/corr.py rebuilt)
# ---------------------------------------------------------------------------
def build_corr_pyramid(
    fmap0: jnp.ndarray, fmap1: jnp.ndarray, num_levels: int = 4,
    out_dtype=None,
) -> Tuple[jnp.ndarray, ...]:
    """fmap* [B, H, W, C] -> tuple of [B, H*W, Hk, Wk] volumes.

    Every level is one [B, HW, C] x [B, C, HkWk] MXU matmul of f0 against a
    2x2-average-pooled fmap1: corr is LINEAR in fmap1, so pooling fmap1
    (4 MB) before correlating equals the reference's pooling of the corr
    volume (268 MB at 512 grid — a 35 ms reduce-window chain on TPU).

    out_dtype=bfloat16 writes the volume in bf16 straight from the MXU
    (fp32 accumulation, then one rounding) — the lookup path quantizes to
    bf16 anyway (ops/corr_lookup_mm.prepare), so this only moves the cast
    into the matmul epilogue and halves the volume's HBM write + re-read
    (~800 MB/flow-pass at 512 grid)."""
    b, h, w, c = fmap0.shape
    f0 = fmap0.reshape(b, h * w, c)
    scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
    pyramid = []
    f1l = fmap1
    for lvl in range(num_levels):
        hk, wk = f1l.shape[1:3]
        corr = (
            jnp.einsum(
                "bnc,bmc->bnm",
                f0,
                f1l.reshape(b, hk * wk, c),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if out_dtype is not None:
            corr = corr.astype(out_dtype)
        pyramid.append(corr.reshape(b, h * w, hk, wk))
        if min(hk, wk) < 4:
            break  # tiny test grids: deeper levels would be empty
        f1l = nn.avg_pool(f1l, window_shape=(2, 2), strides=(2, 2))
    return tuple(pyramid)


def lookup_corr(
    pyramid: Tuple[jnp.ndarray, ...], coords: jnp.ndarray, radius: int = 3
) -> jnp.ndarray:
    """Sample each level of the pyramid in a (2r+1)^2 window around per-pixel
    target coords [B, H, W, 2] (row, col). Returns [B, H, W, L*(2r+1)^2].

    TPU optimisation: the 49 window offsets are integer-spaced, so every
    offset shares the same bilinear fractions as the center — instead of
    4 corner gathers per offset (196 scalar reads/pixel/level, ~204 ms/iter
    at 512 grid) we gather ONE contiguous (2r+2)^2 window per pixel (64
    reads) and blend 4 shifted views with the two scalar fractions
    (~12x fewer gather elements). Out-of-bounds taps contribute exact
    zeros, matching the reference's grid_sample padding_mode='zeros'
    (raft_code/utils.bilinear_sampler)."""
    b, h, w, _ = coords.shape
    win = 2 * radius + 1
    out = []
    for lvl, corr in enumerate(pyramid):
        hk, wk = corr.shape[-2:]
        centers = coords.reshape(b, h * w, 2) / (2.0**lvl)
        r = centers[..., 0]
        c = centers[..., 1]
        r0 = jnp.floor(r).astype(jnp.int32)
        c0 = jnp.floor(c).astype(jnp.int32)
        fr = (r - r0)[..., None, None]
        fc = (c - c0)[..., None, None]
        d = jnp.arange(-radius, radius + 2, dtype=jnp.int32)  # win+1 offsets
        rows_u = r0[..., None] + d  # unclipped [B, HW, win+1]
        cols_u = c0[..., None] + d
        vr = ((rows_u >= 0) & (rows_u < hk)).astype(corr.dtype)
        vc = ((cols_u >= 0) & (cols_u < wk)).astype(corr.dtype)
        rows = jnp.clip(rows_u, 0, hk - 1)
        cols = jnp.clip(cols_u, 0, wk - 1)
        flat = rows[..., :, None] * wk + cols[..., None, :]  # [B, HW, w1, w1]
        volf = corr.reshape(b, h * w, hk * wk)
        wnd = jnp.take_along_axis(
            volf, flat.reshape(b, h * w, -1), axis=-1
        ).reshape(b, h * w, win + 1, win + 1)
        # zero out-of-bounds corners (padding_mode='zeros' semantics)
        wnd = wnd * vr[..., :, None] * vc[..., None, :]
        s = (
            wnd[..., :win, :win] * (1 - fr) * (1 - fc)
            + wnd[..., :win, 1:] * (1 - fr) * fc
            + wnd[..., 1:, :win] * fr * (1 - fc)
            + wnd[..., 1:, 1:] * fr * fc
        )
        # reference tap ordering: CorrBlock's delta = meshgrid(dy, dx)
        # added to (x, y) coords puts the COLUMN offset on the first window
        # axis (corr.py:31-39) — emit taps transposed to stay
        # channel-compatible with reference checkpoints
        s = jnp.swapaxes(s, -2, -1)
        out.append(s.reshape(b, h, w, win * win))
    return jnp.concatenate(out, axis=-1)


def _corr_path() -> str:
    """Correlation implementation: 'fused' (TPU default — pallas kernel
    recomputes per-tile corr rows in VMEM, never materializing the pyramid
    in HBM, ops/corr_fused_pallas), 'mm' (materialized bf16 volume + one-hot
    MXU lookups, ops/corr_lookup_mm), 'gather' (jnp gathers — CPU default).
    Override with LISO_CORR_PATH; LISO_DISABLE_PALLAS_LOOKUP forces
    'gather' (kept for compatibility)."""
    import os

    forced = os.environ.get("LISO_CORR_PATH")
    if forced:
        return forced
    if os.environ.get("LISO_DISABLE_PALLAS_LOOKUP"):
        return "gather"
    return "fused" if jax.default_backend() == "tpu" else "gather"


def _use_mm_lookup() -> bool:
    return _corr_path() == "mm"


def make_corr_lookup(pyramid, radius: int = 3):
    """Returns a coords -> [B, H, W, L*49] lookup closure. On TPU the
    pyramid is cast to bf16 ONCE and each of the 6 RAFT iterations selects
    its windows with batched one-hot MXU matmuls (ops/corr_lookup_mm) —
    exact lookup_corr semantics, no gathers fwd or bwd; elsewhere the jnp
    gather path is used."""
    if _use_mm_lookup():
        from liso_tpu.ops.corr_lookup_mm import (
            lookup_prepared_mm, prepare_corr_volumes_mm,
        )

        prepared = prepare_corr_volumes_mm(pyramid, radius)
        return lambda coords: lookup_prepared_mm(prepared, coords, radius)
    return lambda coords: lookup_corr(pyramid, coords, radius)


def lookup_corr_dispatch(pyramid, coords, radius: int = 3) -> jnp.ndarray:
    """One-shot dispatch (kept for tests); loops should use
    make_corr_lookup to hoist volume preparation."""
    return make_corr_lookup(pyramid, radius)(coords)


# ---------------------------------------------------------------------------
# Update block (update.py rebuilt)
# ---------------------------------------------------------------------------
class ConvGRU(nn.Module):
    hidden_dim: int = 96
    dtype: object = None

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        # z and r gates share the input: ONE conv with 2x hidden outputs
        # (exact concatenated-weight equivalent of separate convz/convr;
        # conv cost here is per-op-overhead-bound, see docs/STATUS.md)
        zr = nn.Conv(
            2 * self.hidden_dim, (3, 3), dtype=self.dtype, name="convzr"
        )(hx)
        z = jax.nn.sigmoid(zr[..., : self.hidden_dim])
        r = jax.nn.sigmoid(zr[..., self.hidden_dim :])
        q = jnp.tanh(
            nn.Conv(self.hidden_dim, (3, 3), dtype=self.dtype, name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return ((1 - z) * h + z * q).astype(jnp.float32)


class FlowClsHead(nn.Module):
    """update.py:FlowOrClassificationHead — conv(3x3, hidden) + relu +
    conv(3x3, out)."""

    hidden_dim: int = 128
    out_dims: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(
            nn.Conv(self.hidden_dim, (3, 3), dtype=self.dtype, name="conv1")(x)
        )
        # small-variance init on the prediction conv: iterations start
        # near-identity (tiny deltas), so the first optimizer steps see an
        # almost-zero-flow loss surface instead of random-flow noise —
        # stabilizes the warmup transient. NOT exactly zero: with the
        # outlier-dropping kNN loss, an exact zero-flow start is a local
        # basin where moving objects past the drop margin produce no
        # gradient at all (verified on a synthetic moving-cluster scene).
        return nn.Conv(
            self.out_dims, (3, 3), dtype=self.dtype, name="conv2",
            kernel_init=nn.initializers.normal(1e-2),
        )(x).astype(jnp.float32)


class SmallMotionEncoder(nn.Module):
    """update.py:SmallMotionEncoder rebuilt channels-last."""

    predict_logits: bool = True
    flow_channels: int = 2  # 3 when static-aggregation weight is predicted
    dtype: object = None

    @nn.compact
    def __call__(self, flow, corr, logits):
        dt = self.dtype
        c = nn.relu(nn.Conv(96, (1, 1), dtype=dt, name="conv_stat_corr1")(corr))
        if not self.predict_logits:
            f = nn.relu(nn.Conv(64, (7, 7), dtype=dt, name="conv_flow1")(flow))
            f = nn.relu(nn.Conv(32, (3, 3), dtype=dt, name="conv_flow2")(f))
            out = nn.relu(
                nn.Conv(80, (3, 3), dtype=dt, name="conv")(
                    jnp.concatenate([c, f], -1)
                )
            )
            return jnp.concatenate([out, f], axis=-1)
        # flow and logits branches fused: one 7x7 + one 3x3 over the
        # concatenated (flow ++ logits) input instead of twin towers —
        # the branches only ever feed a concat, and conv cost here is
        # per-op-overhead-bound (TPU-first redesign of update.py:96-128;
        # cross-mixing between the branches is additional capacity, not
        # a restriction)
        fl = nn.relu(
            nn.Conv(128, (7, 7), dtype=dt, name="conv_flowcls1")(
                jnp.concatenate([flow, logits], -1)
            )
        )
        fl = nn.relu(nn.Conv(64, (3, 3), dtype=dt, name="conv_flowcls2")(fl))
        out = nn.relu(
            nn.Conv(80, (3, 3), dtype=dt, name="conv")(
                jnp.concatenate([c, fl], -1)
            )
        )
        return jnp.concatenate([out, fl], axis=-1)


class SmallUpdateBlock(nn.Module):
    hidden_dim: int = 96
    predict_logits: bool = True
    predict_weight_for_static_aggregation: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, net, inp, corr, flow, logits, weight_logits):
        if self.predict_weight_for_static_aggregation:
            flow_in = jnp.concatenate([flow, weight_logits], axis=-1)
        else:
            flow_in = flow
        motion = SmallMotionEncoder(
            predict_logits=self.predict_logits,
            flow_channels=flow_in.shape[-1],
            dtype=self.dtype,
            name="motion_encoder",
        )(flow_in, corr, logits)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(net, x)

        n_flow_out = 3 if self.predict_weight_for_static_aggregation else 2
        if not self.predict_logits:
            delta = FlowClsHead(
                128, n_flow_out, dtype=self.dtype, name="static_flow_head"
            )(net)
            delta_flow = delta[..., :2]
            delta_weights = (
                delta[..., -1:]
                if self.predict_weight_for_static_aggregation
                else None
            )
            return net, delta_flow, None, delta_weights
        # flow + classification heads fused: both consume `net`, so the two
        # hidden convs concatenate into one (exact) and the two output
        # convs become ONE grouped conv (feature_group_count=2 keeps each
        # head reading only its own hidden half — exact equivalent of the
        # reference's separate FlowOrClassificationHeads, update.py:96)
        h = nn.relu(
            nn.Conv(256, (3, 3), dtype=self.dtype, name="heads_conv1")(net)
        )
        out_per_group = max(n_flow_out, 4)
        # small-variance init (see FlowClsHead.conv2): near-identity start
        delta = nn.Conv(
            2 * out_per_group, (3, 3), feature_group_count=2,
            dtype=self.dtype, name="heads_conv2",
            kernel_init=nn.initializers.normal(1e-2),
        )(h).astype(jnp.float32)
        flow_part = delta[..., :out_per_group]
        delta_flow = flow_part[..., :2]
        delta_weights = (
            flow_part[..., 2:3]
            if self.predict_weight_for_static_aggregation
            else None
        )
        delta_logits = delta[..., out_per_group : out_per_group + 4]
        return net, delta_flow, delta_logits, delta_weights


# ---------------------------------------------------------------------------
def _upsample_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """[n_out, n_in] align-corners linear-interpolation weights (2 nonzeros
    per row)."""
    pos = jnp.linspace(0.0, n_in - 1.0, n_out)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n_in - 1)
    f = (pos - i0).astype(jnp.float32)
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[rows, i0].add(1.0 - f)
    m = m.at[rows, i1].add(f)
    return m


def upsample_bilinear(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """xN bilinear upsample with align_corners=True semantics
    (raft_code/utils.py:upflow_n / uplogits_n use F.interpolate(...,
    align_corners=True)).

    Formulated as two dense interpolation matmuls (out = R x Cᵀ applied
    per axis): separable bilinear is linear per axis, so this equals the
    gather formulation, but it rides the MXU and — crucially for training —
    its VJP is two transposed matmuls instead of the gathers' serializing
    scatter-add. HIGHEST precision keeps the 2-term interpolation sums in
    fp32."""
    b, h, w, c = x.shape
    R = _upsample_matrix(h, h * n)
    C = _upsample_matrix(w, w * n)
    y = jnp.einsum(
        "ph,bhwc->bpwc", R, x.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.einsum(
        "qw,bpwc->bpqc", C, y, precision=jax.lax.Precision.HIGHEST
    )


class RAFT(nn.Module):
    """raft_mod.py:RAFT rebuilt: one direction's iterative flow predictor.

    __call__ returns stacked per-iteration network outputs
    [iters, B, H, W, 8(+1)]: 4 logits ++ 2 static flow ++ 2 dynamic flow
    (++ 1 static-aggregation weight logit), flows in meters, full BEV
    resolution (concat layout of HeadDecoder.concat2network_output,
    head_decoder.py:36-65; static and dynamic flow are the same tensor at
    this point, as in raft_mod.py:244-252).
    """

    num_iters: int = 6
    corr_levels: int = 4
    corr_radius: int = 3
    hidden_dim: int = 96
    context_dim: int = 64
    corr_feature_dim: int = 128
    downsample: int = 8
    resolution_m: float = 0.2  # meters per (full-res) BEV pixel
    fnet_norm: str = "instance_affine"
    predict_logits: bool = True
    predict_weight_for_static_aggregation: bool = False
    joint_encoders: bool = True  # one shared tower (TPU-first); False =
    # reference twin fnet/cnet towers
    torch_compat: bool = False  # with joint_encoders=False: torch-aligned
    # padding + downsample quirks so converted reference checkpoints
    # (models/torch_compat.convert_raft_state_dict) are value-exact
    dtype: object = None  # set jnp.bfloat16 for mixed-precision compute

    def setup(self):
        if self.joint_encoders:
            assert not self.torch_compat, (
                "torch_compat requires the reference twin-tower layout "
                "(joint_encoders=False)"
            )
            self.joint = JointEncoder(
                self.corr_feature_dim,
                self.hidden_dim + self.context_dim,
                self.fnet_norm,
                self.dtype,
            )
        else:
            self.fnet = SmallEncoder(
                self.corr_feature_dim, self.fnet_norm, self.dtype,
                torch_compat=self.torch_compat,
            )
            self.cnet = SmallEncoder(
                self.hidden_dim + self.context_dim, "none", self.dtype,
                torch_compat=self.torch_compat,
            )
        self.update_block = SmallUpdateBlock(
            self.hidden_dim,
            self.predict_logits,
            self.predict_weight_for_static_aggregation,
            dtype=self.dtype,
        )

    def encode(self, img: jnp.ndarray):
        """Per-frame features (streaming deployments cache these so each
        new frame is encoded exactly once)."""
        if self.joint_encoders:
            return self.joint(img)
        return self.fnet(img), self.cnet(img)

    def __call__(
        self, img0: jnp.ndarray, img1: jnp.ndarray, upsample_all: bool = True
    ):
        fmap0, cn0 = self.encode(img0)
        fmap1 = self.encode(img1)[0]
        return self.flow_from_features(
            fmap0, cn0, fmap1, upsample_all=upsample_all
        )

    def flow_from_features(
        self,
        fmap0: jnp.ndarray,
        cn: jnp.ndarray,  # cnet features of frame 0
        fmap1: jnp.ndarray,
        upsample_all: bool = True,
    ):
        update = self.update_block
        if _corr_path() == "fused":
            # never materialize the pyramid: per-tile corr rows are
            # recomputed in VMEM inside the pallas lookup kernel
            # (ops/corr_fused_pallas) — same bf16-quantized values as the
            # mm path, ~13x less HBM traffic per lookup
            from liso_tpu.ops.corr_fused_pallas import (
                corr_window_features, pool_f1_levels,
            )

            f1cat, lvls = pool_f1_levels(fmap1, self.corr_levels)
            bsz = fmap0.shape[0]
            f0_flat = fmap0.reshape(bsz, -1, fmap0.shape[-1])
            corr_lookup = lambda coords: corr_window_features(
                f0_flat, f1cat, coords, lvls, self.corr_radius
            )
        else:
            pyramid = build_corr_pyramid(
                fmap0, fmap1, self.corr_levels,
                # mm-lookup path quantizes to bf16 anyway: write the volume
                # in bf16 straight from the MXU epilogue (same values, half
                # the HBM traffic); the gather path keeps fp32
                out_dtype=jnp.bfloat16 if _use_mm_lookup() else None,
            )
            corr_lookup = make_corr_lookup(pyramid, self.corr_radius)

        net = jnp.tanh(cn[..., : self.hidden_dim])
        inp = nn.relu(cn[..., self.hidden_dim :])

        b, h, w, _ = fmap0.shape
        coords0 = jnp.stack(
            jnp.meshgrid(
                jnp.arange(h, dtype=jnp.float32),
                jnp.arange(w, dtype=jnp.float32),
                indexing="ij",
            ),
            axis=-1,
        )[None].repeat(b, axis=0)

        flow = jnp.zeros((b, h, w, 2), jnp.float32)
        logits = jnp.zeros((b, h, w, 4), jnp.float32)
        wlog = jnp.zeros((b, h, w, 1), jnp.float32)

        # meters per coarse pixel: flow lives on the /8 grid in pixel units,
        # upsampled x8 and scaled to meters at the output (the reference's
        # upflow_n multiplies by 8 then scales by meters-per-final-pixel;
        # identical because res_coarse = 8 * res_full).
        m_per_px = self.resolution_m * self.downsample

        # python loop, not lax.scan: linen submodules can't be traced inside
        # a raw scan body; 6 shared-weight iterations unroll cheaply and XLA
        # fuses them (reference also unrolls, raft_mod.py:187-257)
        outputs = []
        for it in range(self.num_iters):
            flow = jax.lax.stop_gradient(flow)
            logits = jax.lax.stop_gradient(logits)
            wlog = jax.lax.stop_gradient(wlog)

            corr = corr_lookup(coords0 + flow)
            net, dflow, dlogits, dw = update(
                net,
                inp,
                corr,
                flow,
                logits if self.predict_logits else None,
                wlog if self.predict_weight_for_static_aggregation else None,
            )
            flow = flow + dflow
            if self.predict_logits:
                logits = logits + dlogits
            if self.predict_weight_for_static_aggregation:
                wlog = wlog + dw

            if not upsample_all and it < self.num_iters - 1:
                continue  # inference: only the final iteration is consumed
            up_flow = upsample_bilinear(flow, self.downsample) * m_per_px
            up_logits = upsample_bilinear(logits, self.downsample)
            outs = [up_logits, up_flow, up_flow]
            if self.predict_weight_for_static_aggregation:
                outs.append(upsample_bilinear(wlog, self.downsample))
            outputs.append(jnp.concatenate(outs, axis=-1))
        return jnp.stack(outputs, axis=0)
