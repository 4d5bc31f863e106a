"""RAFT correlation window lookup as batched one-hot MXU matmuls.

The naive XLA formulation (models/raft.lookup_corr) gathers 64 scalars per
pixel per level — gather-op overhead bound on TPU. Two pallas kernel
generations (per-pixel-map streaming; dense flat maps + rolls) were HBM- or
vector-issue-bound at 6-23 ms per lookup at 512-grid scale. This
formulation instead selects each pixel's (win+1)x(win+1) window with two
batched matmuls against one-hot selector matrices:

    wnd[p, i, j] = sum_{r, c} S_r[p, i, r] * vol[p, r, c] * S_c[p, j, c]

where S_r[p, i, :] = onehot(clip(r0[p] - radius + i, 0, hk - 1)) — the
per-tap index clipping of lookup_corr folded into the selector. One-hot
selection of bf16 values is LOSSLESS, and the bilinear blend runs in fp32
afterwards, so the result is bit-identical to lookup_corr on a
bf16-quantized pyramid (for ALL coords, including far out-of-bounds).

MXU cost at 512 grid (maps 64^2, batch 8): ~17 GFLOP per lookup after tile
padding — ~0.1 ms; the stream of the bf16 volume (~360 MB for 4 pyramid
levels, no layout padding: volumes stay in their natural dense [B, HW, hk,
wk] shape) is the actual floor. Autodiff gives the volume cotangent as two
more batched matmuls — no scatters in the backward pass.

Behavioral reference: liso/slim/model/raft_code/corr.py:6-56 (CorrBlock
bilinear grid_sample lookup).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def prepare_corr_volumes_mm(pyramid, radius: int = 3):
    """Cast the pyramid to bf16 once (RAFT looks the same volumes up 6x;
    one-hot selection is exact on the quantized values)."""
    return tuple(v.astype(jnp.bfloat16) for v in pyramid)


def lookup_prepared_mm(
    volumes: Tuple[jnp.ndarray, ...], coords: jnp.ndarray, radius: int = 3
) -> jnp.ndarray:
    """volumes: per-level [B, HW, hk, wk] bf16; coords [B, H, W, 2] (row,
    col) at level-0 resolution. Returns [B, H, W, L*(2r+1)^2] f32 with the
    same tap ordering as models/raft.lookup_corr."""
    b, h, w, _ = coords.shape
    win = 2 * radius + 1
    out = []
    for lvl, vol in enumerate(volumes):
        hk, wk = vol.shape[-2:]
        centers = coords.reshape(b, h * w, 2) / (2.0**lvl)
        r = centers[..., 0]
        c = centers[..., 1]
        r0 = jnp.floor(r).astype(jnp.int32)
        c0 = jnp.floor(c).astype(jnp.int32)
        fr = (r - r0)[..., None, None]
        fc = (c - c0)[..., None, None]
        d = jnp.arange(-radius, radius + 2, dtype=jnp.int32)
        # UNCLIPPED taps: out-of-bounds indices match no one-hot column and
        # contribute exact zeros — the reference's grid_sample padding_mode
        # 'zeros' semantics (raft_code/utils.bilinear_sampler)
        rows = r0[..., None] + d  # [B, HW, win+1]
        cols = c0[..., None] + d
        sr = (
            rows[..., None] == jnp.arange(hk, dtype=jnp.int32)
        ).astype(jnp.bfloat16)  # [B, HW, win+1, hk]
        sc = (
            cols[..., None] == jnp.arange(wk, dtype=jnp.int32)
        ).astype(jnp.bfloat16)  # [B, HW, win+1, wk]
        tmp = jnp.einsum(
            "pnir,pnrc->pnic", sr, vol,
            preferred_element_type=jnp.bfloat16,
        )  # lossless row pick
        wnd = jnp.einsum(
            "pnic,pnjc->pnij", tmp, sc,
            preferred_element_type=jnp.float32,
        )  # [B, HW, win+1, win+1]
        s = (
            wnd[..., :win, :win] * (1 - fr) * (1 - fc)
            + wnd[..., :win, 1:] * (1 - fr) * fc
            + wnd[..., 1:, :win] * fr * (1 - fc)
            + wnd[..., 1:, 1:] * fr * fc
        )
        # reference tap ordering (see models/raft.lookup_corr): column
        # offset on the first window axis
        s = jnp.swapaxes(s, -2, -1)
        out.append(s.reshape(b, h, w, win * win))
    return jnp.concatenate(out, axis=-1)
