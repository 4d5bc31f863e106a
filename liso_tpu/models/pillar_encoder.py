"""PointPillars feature encoder, TPU-native.

Replaces the reference's mmcv CUDA `Voxelization` + mmdet3d `PillarFeatureNet`
+ `PointPillarsScatter` stack (used via
liso/networks/pcl_to_feature_grid/pcl_to_feature_grid.py:10-107). The CUDA
path builds a sparse [num_pillars, 20, C] tensor with dynamic pillar counts;
here every padded point is encoded in place ([B, N, 9] -> [B, N, C]) and
reduced straight into the dense BEV image with a segment-max — one fused XLA
program, static shapes, no voxel list.

Feature layout matches mmdet3d PillarFeatureNet (with_distance=False):
  [x, y, z, intensity..., x-xm, y-ym, z-zm, x-xc, y-yc]
where (xm, ym, zm) is the pillar mean and (xc, yc) the pillar center.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from liso_tpu.ops import scatter
from liso_tpu.ops.bev import BevSetup
from liso_tpu.ops.pillars import pillarize


class PreparedPillars(struct.PyTreeNode):
    """Output of prepare_pillar_inputs. grid_size/z_cutoff record the
    config the prep was computed under so sharing consumers can verify
    compatibility (ADVICE r3: a mismatched shared prep silently applies
    the wrong z mask). They are static pytree metadata, so the check
    stays a concrete Python comparison even under jit."""

    feats: jnp.ndarray  # [B, N, F+5], cell-sorted
    cell: jnp.ndarray  # [B, N] int32 cell ids (sorted)
    in_pillar: jnp.ndarray  # [B, N] bool
    grid_size: tuple = struct.field(pytree_node=False, default=())
    z_cutoff: float = struct.field(pytree_node=False, default=5.0)

    def __getitem__(self, i):  # legacy (feats, cell, in_pillar) unpacking
        return (self.feats, self.cell, self.in_pillar)[i]


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (batch, points) that ignores padded points.

    The reference PFN uses BatchNorm1d(eps=1e-3, momentum=0.01) over the
    packed point list; our point axis is padded so statistics are computed
    over valid points only (the CUDA voxelizer's zero-padded in-pillar points
    polluted stats slightly; masking is the cleaner equivalent).
    """

    momentum: float = 0.99
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            m = mask[..., None].astype(x.dtype)
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            var = ((x - mean) ** 2 * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


def prepare_pillar_inputs(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    bev: BevSetup,
    z_cutoff: float = 5.0,
):
    """Pure (parameter-free) pillar input prep shared by every pillar
    encoder consuming the same cloud: cell-id assignment, the cell sort,
    per-point cluster means and center offsets, feature assembly.

    Returns PreparedPillars(feats [B, N, F+5], cell_s [B, N],
    in_pillar_s [B, N], grid_size, z_cutoff) with points SORTED by cell
    id. SLIM and the detector each run their own learned PFN (Dense/BN)
    on top, but this input stage is identical — the fused streaming step
    computes it once and passes it to both (the reference runs mmcv
    Voxelization per network; here the prep is ~half the encoder cost,
    see benchmarks/pillar_breakdown.py). The grid_size/z_cutoff fields
    let consuming encoders assert the prep matches their own config
    (sharing a prep between differently-configured encoders would be
    silently wrong masking otherwise).
    """
    h, w = bev.grid_size

    cell_id, in_pillar = jax.vmap(
        lambda pts, msk: pillarize(pts, msk, bev, z_cutoff=z_cutoff)
    )(points, valid)

    # sort points by cell once so every segment reduction can use
    # sorted order (one multi-operand lax.sort carries the payload
    # columns with the keys — ~1.6x faster than argsort + gathers)
    f = points.shape[-1]
    sorted_ops = jax.lax.sort(
        [cell_id]
        + [points[..., i] for i in range(f)]
        + [in_pillar.astype(jnp.float32)],
        dimension=-1,
        num_keys=1,
    )
    cell_s = sorted_ops[0]
    pts_s = jnp.stack(sorted_ops[1 : 1 + f], axis=-1)
    in_pillar_s = sorted_ops[1 + f] > 0.5

    # per-point cluster means via segmented scans (no grid round
    # trip: XLA scatter/gather serialize on TPU, see
    # grid_scatter_pallas.py / ops/scatter.sorted_segment_totals)
    xyz1 = jnp.concatenate(
        [pts_s[..., :3], jnp.ones_like(pts_s[..., :1])], axis=-1
    )
    totals = scatter.sorted_segment_totals(xyz1, cell_s)
    mean_at_pts = totals[..., :3] / jnp.maximum(totals[..., 3:], 1e-8)
    cluster_off = pts_s[..., :3] - mean_at_pts

    res = jnp.asarray(bev.res_m, points.dtype)
    emin = jnp.asarray(bev.extent_min, points.dtype)
    rc = jnp.stack([cell_s // w, cell_s % w], axis=-1).astype(points.dtype)
    center_off = pts_s[..., :2] - ((rc + 0.5) * res + emin)
    feats = jnp.concatenate([pts_s, cluster_off, center_off], axis=-1)
    feats = jnp.where(in_pillar_s[..., None], feats, 0.0)
    return PreparedPillars(
        feats=feats, cell=cell_s, in_pillar=in_pillar_s,
        grid_size=tuple(bev.grid_size), z_cutoff=float(z_cutoff),
    )


class PillarEncoder(nn.Module):
    """points [B, N, F] + valid [B, N] -> (bev image [B, H, W, C],
    occupancy [B, H, W, 1]).

    One PFN layer (linear -> masked BN -> ReLU -> per-pillar max) like the
    reference's 64-channel config (pcl_to_feature_grid.py:40-47). Pass
    `prepared` (from prepare_pillar_inputs) to skip the shared input prep
    when several encoders consume the same cloud.

    `point_feats` exposes the pre-scatter per-point features so several
    encoders over the SAME cloud can share ONE scatter kernel call via
    `fused_scatter_images` (the [tile, K] x [K, C] one-hot matmuls pad C
    to 128 lanes, so scattering two 64-channel encoders together costs
    the same as one — see benchmarks/scatter_probe.py).
    """

    setup_bev: BevSetup
    num_channels: int = 64
    z_cutoff: float = 5.0

    def setup(self):
        self.pfn_linear = nn.Dense(self.num_channels, use_bias=False)
        self.pfn_bn = MaskedBatchNorm()

    def _check_prepared(self, prepared):
        bev = self.setup_bev
        if prepared is None:
            return None
        if isinstance(prepared, PreparedPillars):
            assert prepared.grid_size == tuple(bev.grid_size), (
                f"shared pillar prep was computed for grid "
                f"{prepared.grid_size}, encoder expects {tuple(bev.grid_size)}"
            )
            assert prepared.z_cutoff == float(self.z_cutoff), (
                f"shared pillar prep used z_cutoff={prepared.z_cutoff}, "
                f"encoder expects {self.z_cutoff}"
            )
        return prepared

    def point_feats(
        self,
        points: jnp.ndarray,
        valid: jnp.ndarray,
        train: bool = False,
        prepared=None,
    ):
        """Pre-scatter per-point features: (x [B, N, C], prepared)."""
        prepared = self._check_prepared(prepared)
        if prepared is None:
            prepared = prepare_pillar_inputs(
                points, valid, self.setup_bev, z_cutoff=self.z_cutoff
            )
        feats, _, in_pillar_s = prepared[:3]
        x = self.pfn_linear(feats)
        x = self.pfn_bn(x, in_pillar_s, train)
        return nn.relu(x), prepared

    def __call__(
        self,
        points: jnp.ndarray,
        valid: jnp.ndarray,
        train: bool = False,
        prepared=None,
    ):
        bev = self.setup_bev
        h, w = bev.grid_size
        nc = bev.num_cells

        x, prepared = self.point_feats(
            points, valid, train=train, prepared=prepared
        )
        feats, cell_s, in_pillar_s = prepared[:3]

        from liso_tpu.ops.grid_scatter_pallas import (
            grid_reduce_with_occ, use_pallas_grid_ops,
        )

        on_tpu = use_pallas_grid_ops()

        if on_tpu:
            # one kernel call; occupancy rides the reduction's own one-hot
            # masks (grid_reduce_with_occ) instead of a 65th channel.
            # exact=False: bf16 matmul passes — the image feeds bf16 convs
            g, occ_g = grid_reduce_with_occ(
                x.astype(jnp.bfloat16), cell_s, nc, "max", False, False
            )
            img = g.reshape(-1, h, w, self.num_channels)
            occ = occ_g.reshape(-1, h, w, 1)
            return img, occ
        else:
            x = jnp.where(in_pillar_s[..., None], x, -jnp.inf)

            def per_sample_max(xi, ci):
                g = jax.ops.segment_max(
                    xi, ci, num_segments=nc + 1, indices_are_sorted=True
                )[:nc]
                g = jnp.where(jnp.isfinite(g), g, 0.0)
                return g.reshape(h, w, self.num_channels)

            img = jax.vmap(per_sample_max)(x, cell_s)

        def per_sample_cnt(inp_i, ci):
            return jax.ops.segment_sum(
                inp_i.astype(jnp.float32), ci, num_segments=nc + 1,
                indices_are_sorted=True,
            )[:nc]

        cnt_grid = jax.vmap(per_sample_cnt)(in_pillar_s, cell_s)
        occ = (cnt_grid > 0).astype(jnp.float32).reshape(-1, h, w, 1)
        return img, occ


def fused_scatter_images(xs, prepared, bev: BevSetup):
    """Scatter SEVERAL encoders' per-point features (same cloud, same
    prep) to dense BEV images with ONE kernel call.

    xs: list of [B, N, Ci] point features (from PillarEncoder.point_feats
    with a shared `prepared`). Returns (list of [B, H, W, Ci] images,
    occupancy [B, H, W, 1]).

    The one-hot scatter matmul pads channels to 128 lanes, so a fused
    C=sum(Ci)=128 call costs the same as one C=65 call — halving the
    scatter cost of the fused SLIM+detector step (the reference runs mmcv
    Voxelization+scatter once per network, pcl_to_feature_grid.py:24-54).
    Occupancy is computed by the scalar-channel scatter kernel (appending
    it to the fused features would pad 129 -> 256 lanes); consumers that
    drop `occ` get it DCE'd by XLA.
    """
    from liso_tpu.ops.grid_scatter_pallas import (
        grid_reduce_with_occ, use_pallas_grid_ops,
    )

    h, w = bev.grid_size
    nc = bev.num_cells
    feats_, cell_s, in_pillar_s = prepared[:3]
    b = cell_s.shape[0]
    sizes = [x.shape[-1] for x in xs]

    if use_pallas_grid_ops():
        # ONE kernel call for features AND occupancy: the occ grid rides
        # the reduction's own one-hot masks (out-of-pillar points sit in
        # the drop bucket and never match), replacing the previous second
        # C=1 count kernel and its full mask rebuild
        xcat = jnp.concatenate(xs, axis=-1).astype(jnp.bfloat16)
        g, occ_g = grid_reduce_with_occ(xcat, cell_s, nc, "max", False, False)
        occ = occ_g.reshape(b, h, w, 1)
    else:
        xcat = jnp.concatenate(xs, axis=-1)
        xcat = jnp.where(in_pillar_s[..., None], xcat, -jnp.inf)

        def per_sample_max(xi, ci):
            gi = jax.ops.segment_max(
                xi, ci, num_segments=nc + 1, indices_are_sorted=True
            )[:nc]
            return jnp.where(jnp.isfinite(gi), gi, 0.0)

        g = jax.vmap(per_sample_max)(xcat, cell_s)

        def per_sample_cnt(inp_i, ci):
            return jax.ops.segment_sum(
                inp_i.astype(jnp.float32), ci, num_segments=nc + 1,
                indices_are_sorted=True,
            )[:nc]

        cnt = jax.vmap(per_sample_cnt)(in_pillar_s, cell_s)
        occ = (cnt > 0).astype(jnp.float32).reshape(b, h, w, 1)

    imgs = []
    off = 0
    for ci in sizes:
        imgs.append(g[..., off : off + ci].reshape(b, h, w, ci))
        off += ci
    return imgs, occ


def pillar_coords(points: jnp.ndarray, valid: jnp.ndarray, bev: BevSetup):
    """[B, N, >=2] -> int32 (row, col) per point, clamped in-range, plus
    in-range mask (reference `pillar_coors`, torch_dataset_commons.py:1147)."""
    from liso_tpu.ops.bev import point_cell_ids

    def per_sample(pts, msk):
        _, in_range, rc = point_cell_ids(pts[..., :2], bev, msk)
        return rc, in_range

    return jax.vmap(per_sample)(points, valid)


def point_feature_mask(points: jnp.ndarray, mask: Sequence[bool]) -> jnp.ndarray:
    """Apply the reference's `point_feat_mask` channel selection
    (liso_config.yml:322-334) to the augmented features."""
    idx = [i for i, m in enumerate(mask) if m]
    return points[..., jnp.asarray(idx)]
