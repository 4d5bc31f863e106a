"""CenterPoint-style single-stage BEV detector, TPU-native flax rebuild.

Behavioral reference: liso/networks/centerpoint/{rpn.py:14-146,
center_head.py:9-117} and liso/networks/simple_net/centerpoint_net.py:14-112.
Baseline configuration (use_baseline_parameters=True, liso_config.yml:189):
3 downsampling stages [3, 5, 5] convs at strides [2, 2, 2] with filters
[hid, 128, 256], upsampled back to /4 with [128, 128, 128] channels,
concatenated (384) into a CenterHead of per-attribute SepHeads. Channels-last
throughout; norm is BatchNorm(eps 1e-3, momentum 0.01) as in the reference.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from liso_tpu.models.pillar_encoder import PillarEncoder
from liso_tpu.ops.bev import BevSetup


class ConvBNRelu(nn.Module):
    filters: int
    stride: int = 1
    kernel: int = 3
    transpose: bool = False
    dtype: object = None  # bf16 compute when set (params stay fp32)

    @nn.compact
    def __call__(self, x, train: bool):
        if self.transpose:
            x = nn.ConvTranspose(
                self.filters,
                (self.stride, self.stride),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.filters,
                (self.kernel, self.kernel),
                strides=self.stride,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        # dtype on the norm = bf16 activations at every stage boundary
        # (statistics still accumulate in fp32 internally); emitting fp32
        # here doubles the HBM traffic between bf16 convs
        # use_fast_variance=False: the one-pass Var = E[x^2] - E[x]^2
        # cancels catastrophically when |mean| >> std, making gradients
        # depend on the reduction tree (sharded vs single-device runs
        # diverged ~1% through it); the two-pass form is reduction-order
        # robust for one extra cheap pass
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-3, momentum=0.99,
            dtype=self.dtype, use_fast_variance=False, name="bn"
        )(x)
        return nn.relu(x)


class RPNStage(nn.Module):
    filters: int
    num_blocks: int
    stride: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBNRelu(self.filters, self.stride, dtype=self.dtype,
                       name="down")(x, train)
        for i in range(self.num_blocks):
            x = ConvBNRelu(self.filters, 1, dtype=self.dtype,
                           name=f"block{i}")(x, train)
        return x


class RPN(nn.Module):
    """Multi-scale conv/deconv backbone (rpn.py:14-146)."""

    layer_nums: Sequence[int] = (3, 5, 5)
    ds_strides: Sequence[int] = (2, 2, 2)
    ds_filters: Sequence[int] = (64, 128, 256)
    us_strides: Sequence[float] = (0.5, 1, 2)
    us_filters: Sequence[int] = (128, 128, 128)
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        ups = []
        up_start = len(self.layer_nums) - len(self.us_strides)
        for i, (n, s, f) in enumerate(
            zip(self.layer_nums, self.ds_strides, self.ds_filters)
        ):
            x = RPNStage(f, n, s, dtype=self.dtype, name=f"stage{i}")(x, train)
            j = i - up_start
            if j >= 0:
                us = self.us_strides[j]
                uf = self.us_filters[j]
                if us > 1:
                    y = ConvBNRelu(
                        uf, int(us), transpose=True, dtype=self.dtype,
                        name=f"up{j}",
                    )(x, train)
                else:
                    inv = int(round(1 / us))
                    y = ConvBNRelu(
                        uf, inv, kernel=inv, dtype=self.dtype, name=f"up{j}"
                    )(x, train)
                ups.append(y)
        return jnp.concatenate(ups, axis=-1)


class SepHead(nn.Module):
    """Per-attribute conv heads (center_head.py:9-65): (num_conv-1) x
    conv(3x3, 64) + BN + relu per head, then conv(3x3, out).

    MXU layout: the per-head hidden convs are fused across heads into ONE
    conv producing num_heads*head_conv channels — mathematically identical
    to separate heads (conv(x,W1)||conv(x,W2) == conv(x,[W1|W2]); BatchNorm
    is per-channel, so one BN over the concat equals per-head BNs), but a
    256-wide output keeps the MXU lanes full where four separate 64-wide
    convs each ran at ~half rate (tests/test_detector.py parity test).
    Only the tiny per-head final convs stay separate (their inputs are
    disjoint channel slices)."""

    heads: Tuple[Tuple[str, int], ...]  # ((name, out_channels), ...)
    head_conv: int = 64
    num_conv: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        names = [name for name, _ in self.heads]
        nh = len(names)
        y = x
        for i in range(self.num_conv - 1):
            y = nn.Conv(nh * self.head_conv, (3, 3), dtype=self.dtype,
                        name=f"fused_conv{i}")(y)
            y = nn.BatchNorm(
                use_running_average=not train,
                epsilon=1e-3,
                momentum=0.99,
                dtype=self.dtype,
                use_fast_variance=False,  # see RPN bn comment
                name=f"fused_bn{i}",
            )(y)
            y = nn.relu(y)
        out = {}
        for j, (name, channels) in enumerate(self.heads):
            sl = y[..., j * self.head_conv : (j + 1) * self.head_conv]
            if self.num_conv == 1:
                sl = y  # no hidden convs: every head reads the input
            out[name] = nn.Conv(
                channels, (3, 3), dtype=self.dtype, name=f"{name}_final"
            )(sl).astype(jnp.float32)
        return out


class CenterPointNet(nn.Module):
    """Pillar encoder -> RPN -> shared conv -> SepHeads. Returns
    (dict of channels-last [B, h, w, C] raw attribute maps, occupancy)."""

    bev: BevSetup
    head_channels: Tuple[Tuple[str, int], ...] = (
        ("pos", 3),
        ("dims", 3),
        ("rot", 2),
        ("probs", 1),
    )
    hid_dim: int = 64
    use_baseline_parameters: bool = True
    share_conv_channel: int = 64
    dtype: object = None

    @property
    def out_downsample_factor(self) -> int:
        """BEV grid -> prediction grid factor
        (torch_dataset_commons.get_centermaps_downsampling_factor)."""
        return 4 if self.use_baseline_parameters else 8

    @nn.compact
    def __call__(
        self, points, valid, train: bool = False, prepared=None,
        pillar_image=None, point_feats_only: bool = False,
    ):
        pfn = PillarEncoder(self.bev, num_channels=self.hid_dim, name="pfn")
        if point_feats_only:
            # pre-scatter per-point features for the fused-scatter step
            # (pillar_encoder.fused_scatter_images)
            return pfn.point_feats(points, valid, train=train,
                                   prepared=prepared)
        if pillar_image is not None:
            img, occ = pillar_image
        else:
            img, occ = pfn(points, valid, train=train, prepared=prepared)
        if self.use_baseline_parameters:
            rpn = RPN(dtype=self.dtype, name="rpn")
            head_stride = 1
        else:
            rpn = RPN(
                layer_nums=(3, 5),
                ds_strides=(2, 2),
                ds_filters=(self.hid_dim, 128),
                us_strides=(0.5, 1),
                us_filters=(128, 128),
                dtype=self.dtype,
                name="rpn",
            )
            head_stride = 2
        x = rpn(img, train)
        x = ConvBNRelu(
            self.share_conv_channel, head_stride, dtype=self.dtype,
            name="shared_conv",
        )(x, train)
        maps = SepHead(
            self.head_channels, dtype=self.dtype, name="sep_head"
        )(x, train)
        return maps, occ
