"""TransFusion-style query detector, TPU-native flax rebuild.

Behavioral reference: liso/networks/transfusion/transfusion_head.py:713-1542
and networks/simple_net/transfusion_net.py (a trimmed TransFusion-L). The
essential structure is kept, sized per the reference config
(num_proposals=200, liso_config.yml:185):

  pillar BEV features -> conv backbone -> dense class heatmap ->
  top-K query initialisation from heatmap peaks -> one transformer decoder
  layer (self-attention over queries + cross-attention to flattened BEV
  features, sinusoidal position embeddings) -> per-attribute FFN heads
  predicting offsets relative to the query positions.

Everything is fixed-shape: top_k replaces the CUDA masked scatter-topk, and
attention runs over the (downsampled) BEV token grid.
"""
from __future__ import annotations

from typing import Dict, Tuple

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
            name="backbone",
        )(img, train)  # [B, H/4, W/4, 256]
        feat = ConvBNRelu(self.d_model, 1, name="reduce")(feat, train)
        b, hh, ww, _ = feat.shape

        heatmap = nn.Conv(1, (3, 3), name="heatmap_head")(feat)  # logits

        # query init: top-K heatmap peaks (replaces the CUDA masked topk)
        flat = heatmap.reshape(b, hh * ww)
        _, top_idx = jax.lax.top_k(flat, self.num_proposals)
        qr = (top_idx // ww).astype(jnp.float32)
        qc = (top_idx % ww).astype(jnp.float32)
        tokens = feat.reshape(b, hh * ww, self.d_model)
        query = jnp.take_along_axis(
            tokens, top_idx[..., None], axis=1
        )  # [B, K, d]

        norm_q = jnp.stack([qr / hh, qc / ww], -1)
        rr, cc = jnp.meshgrid(
            jnp.arange(hh, dtype=jnp.float32) / hh,
            jnp.arange(ww, dtype=jnp.float32) / ww,
            indexing="ij",
        )
        norm_k = jnp.stack([rr, cc], -1).reshape(1, hh * ww, 2)
        q_embed = nn.Dense(self.d_model, name="query_pos_mlp")(
            _sine_embed(norm_q, self.d_model)
        )
        k_embed = nn.Dense(self.d_model, name="key_pos_mlp")(
            _sine_embed(jnp.broadcast_to(norm_k, (b, hh * ww, 2)), self.d_model)
        )
        query = DecoderLayer(self.d_model, name="decoder0")(
            query, q_embed, tokens, k_embed
        )

        # query metric positions (bev row<->x, col<->y)
        res_x = self.bev.bev_range_m[0] / hh
        res_y = self.bev.bev_range_m[1] / ww
        qx = (qr + 0.5) * res_x + self.bev.extent_min[0]
        qy = (qc + 0.5) * res_y + self.bev.extent_min[1]

        maps: Dict[str, jnp.ndarray] = {}
        for name, channels in self.head_channels:
            h = nn.Dense(64, name=f"{name}_fc1")(query)
            out = nn.Dense(channels, name=f"{name}_fc2")(nn.relu(h))
            if name == "pos":
                # offsets relative to the query cell center; z absolute
                out = out.at[..., 0].add(qx).at[..., 1].add(qy)
            if name == "probs":
                # query confidence = head logit + its heatmap peak logit
                peak = jnp.take_along_axis(flat, top_idx, axis=1)[..., None]
                out = out + peak
            maps[name] = out[:, None]  # [B, 1, K, C] (flatten -> [B, K, C])
        return maps, occ, heatmap
