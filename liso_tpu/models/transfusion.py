"""TransFusion-style query detector, TPU-native flax rebuild.

Behavioral reference: liso/networks/transfusion/transfusion_head.py:713-1542
and networks/simple_net/transfusion_net.py (a trimmed TransFusion-L,
instantiated with num_proposals=200, num_decoder_layers=1, num_classes=1,
nms_kernel_size=3, auxiliary=True — transfusion_net.py:43-60). Structure:

  pillar BEV features -> conv backbone -> dense per-class heatmap ->
  sigmoid + LOCAL-MAX suppression (3x3 max-pool, borders zeroed,
  transfusion_head.py:1009-1037) -> top-K peaks over classes x cells ->
  query features gathered at peaks + CATEGORY one-hot embedding
  (class_encoding, :1056-1062) -> N transformer decoder layers
  (self-attn over queries + cross-attn to BEV tokens, query positions
  refreshed from each layer's predicted centers, :1085-1105), each layer
  with its own per-attribute FFN prediction head for auxiliary
  supervision (auxiliary=True concatenates all layers, :1123-1135) ->
  query_heatmap_score gathered at the peaks fused into the confidence
  (bbox coder: score * heatmap_score; here additively in logit space).

Everything is fixed-shape: jax.lax.top_k replaces the CUDA masked topk
and the suppression is a max-pool equality mask.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from liso_tpu.models.centerpoint import RPN, ConvBNRelu
from liso_tpu.models.pillar_encoder import PillarEncoder
from liso_tpu.ops.bev import BevSetup


def _sine_embed(xy: jnp.ndarray, dim: int) -> jnp.ndarray:
    """[..., 2] normalized positions -> [..., dim] sinusoidal embedding."""
    half = dim // 4
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / max(half - 1, 1))
    )
    out = []
    for i in range(2):
        ang = xy[..., i : i + 1] * 64.0 * freqs
        out += [jnp.sin(ang), jnp.cos(ang)]
    return jnp.concatenate(out, axis=-1)


def local_max_suppress(heat: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """heatmap [B, H, W, C] (post-sigmoid) -> peaks-only map
    (transfusion_head.py:1009-1037: interior max-pool, borders zeroed,
    keep cells equal to their neighbourhood max)."""
    if kernel <= 1:
        return heat
    pad = kernel // 2
    inner = nn.max_pool(
        heat, window_shape=(kernel, kernel), strides=(1, 1), padding="VALID"
    )
    local_max = jnp.zeros_like(heat)
    local_max = local_max.at[:, pad:-pad, pad:-pad, :].set(inner)
    return heat * (heat == local_max)


class DecoderLayer(nn.Module):
    """transfusion_head.py:54-140: self-attn + cross-attn + FFN with
    positional embeddings added to q/k."""

    d_model: int = 128
    nhead: int = 8
    ffn: int = 256

    @nn.compact
    def __call__(self, query, query_pos_embed, key, key_pos_embed):
        q = query + query_pos_embed
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, name="self_attn"
        )(q, q, query)
        query = nn.LayerNorm(name="norm1")(query + sa)
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, name="cross_attn"
        )(query + query_pos_embed, key + key_pos_embed, key)
        query = nn.LayerNorm(name="norm2")(query + ca)
        h = nn.Dense(self.ffn, name="ffn1")(query)
        h = nn.Dense(self.d_model, name="ffn2")(nn.relu(h))
        return nn.LayerNorm(name="norm3")(query + h)


class PredictionHead(nn.Module):
    """Per-layer FFN heads (prediction_heads[i], one per decoder layer)."""

    head_channels: Tuple[Tuple[str, int], ...]

    @nn.compact
    def __call__(self, query):
        out = {}
        for name, channels in self.head_channels:
            h = nn.Dense(64, name=f"{name}_fc1")(query)
            out[name] = nn.Dense(channels, name=f"{name}_fc2")(nn.relu(h))
        return out


class TransFusionNet(nn.Module):
    bev: BevSetup
    head_channels: Tuple[Tuple[str, int], ...] = (
        ("pos", 3),
        ("dims", 3),
        ("rot", 2),
        ("probs", 1),
    )
    hid_dim: int = 64
    d_model: int = 128
    num_proposals: int = 200
    out_size_factor: int = 4  # heatmap grid = bev grid / this
    num_decoder_layers: int = 1
    num_classes: int = 1
    nms_kernel_size: int = 3
    dtype: object = None  # bf16 conv-backbone compute when set (the
    # decoder/attention stays fp32: 200 queries, numerically sensitive)

    @nn.compact
    def __call__(self, points, valid, train: bool = False):
        img, occ = PillarEncoder(
            self.bev, num_channels=self.hid_dim, name="pfn"
        )(points, valid, train=train)
        feat = RPN(
            layer_nums=(3, 5),
            ds_strides=(2, 2),
            ds_filters=(self.hid_dim, 128),
            us_strides=(0.5, 1),
            us_filters=(128, 128),
            dtype=self.dtype,
            name="backbone",
        )(img, train)  # [B, H/4, W/4, 256]
        feat = ConvBNRelu(
            self.d_model, 1, dtype=self.dtype, name="reduce"
        )(feat, train)
        feat = feat.astype(jnp.float32)
        b, hh, ww, _ = feat.shape

        dense_heatmap = nn.Conv(
            self.num_classes, (3, 3), name="heatmap_head"
        )(feat)  # logits [B, hh, ww, NC]

        # query init: sigmoid + local-max suppression + top-K over
        # classes x cells (replaces the CUDA masked topk)
        heat = jax.nn.sigmoid(jax.lax.stop_gradient(dense_heatmap))
        heat = local_max_suppress(heat, self.nms_kernel_size)
        # [B, NC, hh*ww] (class-major like the reference view)
        heat_cm = heat.transpose(0, 3, 1, 2).reshape(
            b, self.num_classes, hh * ww
        )
        flat_all = heat_cm.reshape(b, self.num_classes * hh * ww)
        peak_score, top_all = jax.lax.top_k(flat_all, self.num_proposals)
        top_cls = top_all // (hh * ww)  # [B, K]
        top_idx = top_all % (hh * ww)
        qr = (top_idx // ww).astype(jnp.float32)
        qc = (top_idx % ww).astype(jnp.float32)
        tokens = feat.reshape(b, hh * ww, self.d_model)
        query = jnp.take_along_axis(tokens, top_idx[..., None], axis=1)
        # category embedding (class_encoding, :1056-1062)
        one_hot = jax.nn.one_hot(top_cls, self.num_classes)
        query = query + nn.Dense(self.d_model, name="class_encoding")(one_hot)

        rr, cc = jnp.meshgrid(
            jnp.arange(hh, dtype=jnp.float32) / hh,
            jnp.arange(ww, dtype=jnp.float32) / ww,
            indexing="ij",
        )
        norm_k = jnp.stack([rr, cc], -1).reshape(1, hh * ww, 2)
        k_embed = nn.Dense(self.d_model, name="key_pos_mlp")(
            _sine_embed(jnp.broadcast_to(norm_k, (b, hh * ww, 2)), self.d_model)
        )
        pos_mlp = nn.Dense(self.d_model, name="query_pos_mlp")

        # query metric positions (bev row<->x, col<->y)
        res_x = self.bev.bev_range_m[0] / hh
        res_y = self.bev.bev_range_m[1] / ww
        qx = (qr + 0.5) * res_x + self.bev.extent_min[0]
        qy = (qc + 0.5) * res_y + self.bev.extent_min[1]
        q_pos_norm = jnp.stack([qr / hh, qc / ww], -1)
        q_pos_metric = jnp.stack([qx, qy], -1)

        peak_logit = jnp.log(
            jnp.clip(peak_score, 1e-6, 1.0 - 1e-6)
        ) - jnp.log1p(-jnp.clip(peak_score, 1e-6, 1.0 - 1e-6))

        layer_maps = []
        for i in range(self.num_decoder_layers):
            q_embed = pos_mlp(_sine_embed(q_pos_norm, self.d_model))
            query = DecoderLayer(self.d_model, name=f"decoder{i}")(
                query, q_embed, tokens, k_embed
            )
            out = PredictionHead(
                self.head_channels, name=f"pred_head{i}"
            )(query)
            # center offsets relative to the current query positions
            # (res_layer["center"] += query_pos, :1098); confidence fused
            # with the suppressed heatmap peak (bbox coder score *
            # heatmap_score — additive in logit space here)
            out["pos"] = (
                out["pos"]
                .at[..., 0].add(q_pos_metric[..., 0])
                .at[..., 1].add(q_pos_metric[..., 1])
            )
            out["probs"] = out["probs"] + peak_logit[..., None]
            layer_maps.append({k: v[:, None] for k, v in out.items()})
            # next layer's positional embedding from the predicted centers
            # (:1104-1105), normalized back to the heatmap grid
            center = jax.lax.stop_gradient(out["pos"])
            nr = (center[..., 0] - self.bev.extent_min[0]) / (res_x * hh)
            nc = (center[..., 1] - self.bev.extent_min[1]) / (res_y * ww)
            q_pos_norm = jnp.stack([nr, nc], -1)
            q_pos_metric = center[..., :2]

        aux = {
            "dense_heatmap": dense_heatmap,
            "layer_maps": tuple(layer_maps),
            "query_heatmap_score": peak_score,
            "query_cls": top_cls,
        }
        return layer_maps[-1], occ, aux
