"""Pallas TPU kernel for the RAFT correlation window lookup.

The XLA formulation (models/raft.lookup_corr) gathers 64 scalars per pixel
per level — gather-op overhead bound (~17 ms/level at 512 grid), not
bandwidth bound. This kernel streams each pixel's own correlation map
through VMEM and extracts the (2r+2)^2 window directly:

  * rows: dynamic slice on the sublane dimension (allowed by Mosaic);
  * cols: the lane dimension cannot be dynamically sliced, so the width is
    padded to 128 lanes and the row block is circularly rolled by -col_start
    (pltpu.roll supports dynamic shifts), putting the window at lanes 0..7;
  * the 4 shifted window views are blended with the pixel's shared bilinear
    fractions (all 49 offsets have integer spacing).

Edge handling is exact: the volume is edge-padded by PAD = win+1, so any
clamped slice start yields the same values as clipping every row/col index
individually (padded index p maps to original clip(p - PAD, 0, n-1)).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _lookup_kernel(scal_ref, vol_ref, out_ref, *, win, unroll=16):
    tile = vol_ref.shape[1]

    def body(j, _):
        # statically unrolled inner batch: removes fori branch overhead and
        # lets Mosaic pipeline the slices/rolls (~20% over 1 pixel/iter)
        for u in range(unroll):
            i = j * unroll + u
            r = scal_ref[0, i, 0].astype(jnp.int32)
            c = scal_ref[0, i, 1].astype(jnp.int32)
            fr = scal_ref[0, i, 2]
            fc = scal_ref[0, i, 3]
            rows = vol_ref[0, i, pl.ds(r, win + 1), :]  # [win+1, lanes]
            # blend rows BEFORE the roll: full-lane VPU ops, then one roll
            rb = rows[:win] * (1 - fr) + rows[1:] * fr
            rolled = pltpu.roll(rb, shift=-c, axis=1)
            out_ref[0, i, :, :] = (
                rolled[:, :win] * (1 - fc) + rolled[:, 1 : win + 1] * fc
            )
        return 0

    jax.lax.fori_loop(0, tile // unroll, body, 0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lookup_level_pallas(
    vol: jnp.ndarray,  # [B, HW, hk, wk] one pyramid level
    centers: jnp.ndarray,  # [B, HW, 2] float (row, col) at this level
    radius: int = 3,
    tile: int = 64,
) -> jnp.ndarray:
    """-> [B, HW, (2r+1)^2] sampled windows (bilinear, edge-clipped).

    Differentiable wrt `vol` only (custom VJP: linear scatter-add of the
    cotangent through the window positions). `centers` gets a zero
    cotangent — correct for RAFT, which detaches flow before every lookup
    (raft_mod.py:187-195 / models/raft.py stop_gradient)."""
    return _lookup_level_fwd_impl(vol, centers, radius, tile)


@partial(jax.jit, static_argnames=("radius", "tile"))
def _lookup_level_fwd_impl(vol, centers, radius: int = 3, tile: int = 64):
    b, hw, hk, wk = vol.shape
    win = 2 * radius + 1
    pad = win + 1
    lanes = -(-(wk + 2 * pad) // LANES) * LANES  # next multiple of 128

    r = centers[..., 0]
    c = centers[..., 1]
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    fr = r - r0
    fc = c - c0
    rs = jnp.clip(r0 - radius + pad, 0, hk + 2 * pad - (win + 1))
    cs = jnp.clip(c0 - radius + pad, 0, wk + 2 * pad - (win + 1))

    volp = jnp.pad(
        vol, ((0, 0), (0, 0), (pad, pad), (pad, lanes - wk - pad)),
        mode="edge",
    )
    hp = hk + 2 * pad

    tile = max(16, (min(tile, hw) // 16) * 16)  # tile % unroll == 0
    hw_pad = -(-hw // tile) * tile
    if hw_pad != hw:  # e.g. 115^2 pixels at the 920 grid
        volp = jnp.pad(volp, ((0, 0), (0, hw_pad - hw), (0, 0), (0, 0)))
        rs = jnp.pad(rs, ((0, 0), (0, hw_pad - hw)))
        cs = jnp.pad(cs, ((0, 0), (0, hw_pad - hw)))
        fr = jnp.pad(fr, ((0, 0), (0, hw_pad - hw)))
        fc = jnp.pad(fc, ((0, 0), (0, hw_pad - hw)))
    n_tiles = hw_pad // tile

    scalars = jnp.stack(
        [
            rs.astype(vol.dtype),
            cs.astype(vol.dtype),
            fr.astype(vol.dtype),
            fc.astype(vol.dtype),
        ]
        + [jnp.zeros_like(fr, vol.dtype)] * 4,
        axis=-1,
    )  # [B, HW, 8]
    out = pl.pallas_call(
        partial(_lookup_kernel, win=win),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, 8), lambda ib, it: (ib, it, 0)),
            pl.BlockSpec(
                (1, tile, hp, lanes), lambda ib, it: (ib, it, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, win, win), lambda ib, it: (ib, it, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw_pad, win, win), vol.dtype),
    )(scalars, volp.reshape(b, n_tiles * tile, hp, lanes))
    return out.reshape(b, hw_pad, win * win)[:, :hw]


def lookup_corr_pallas(pyramid, coords, radius: int = 3):
    """Drop-in replacement for models.raft.lookup_corr on TPU (falls back
    implicitly at trace time only if shapes fit; caller selects)."""
    b, h, w, _ = coords.shape
    outs = []
    for lvl, corr in enumerate(pyramid):
        centers = coords.reshape(b, h * w, 2) / (2.0**lvl)
        outs.append(lookup_level_pallas(corr, centers, radius=radius))
    return jnp.concatenate(outs, axis=-1).reshape(
        b, h, w, len(pyramid) * (2 * radius + 1) ** 2
    )


def _lookup_level_fwd(vol, centers, radius, tile):
    # shape/dtype token (residuals must be jax types)
    token = jnp.zeros(vol.shape[2:], vol.dtype)
    return _lookup_level_fwd_impl(vol, centers, radius, tile), (token, centers)


def _lookup_level_bwd(radius, tile, res, cot):
    """cot [B, HW, win^2] -> d vol: scatter-add the 4 bilinear-shifted
    cotangent views into each pixel's own (hk, wk) map (exact adjoint of
    the window blend; same edge-clipped indices as the jnp gather path)."""
    token, centers = res
    hk, wk = token.shape
    dtype = token.dtype
    b, hw = centers.shape[:2]
    win = 2 * radius + 1
    r = centers[..., 0]
    c = centers[..., 1]
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    fr = (r - r0)[..., None, None]
    fc = (c - c0)[..., None, None]
    cotw = cot.reshape(b, hw, win, win).astype(dtype)
    # adjoint of: out = sum of 4 shifted window views * weights
    g = jnp.zeros((b, hw, win + 1, win + 1), dtype)
    g = g.at[..., :win, :win].add(cotw * (1 - fr) * (1 - fc))
    g = g.at[..., :win, 1:].add(cotw * (1 - fr) * fc)
    g = g.at[..., 1:, :win].add(cotw * fr * (1 - fc))
    g = g.at[..., 1:, 1:].add(cotw * fr * fc)
    d = jnp.arange(-radius, radius + 2, dtype=jnp.int32)
    rows = jnp.clip(r0[..., None] + d, 0, hk - 1)
    cols = jnp.clip(c0[..., None] + d, 0, wk - 1)
    flat = (rows[..., :, None] * wk + cols[..., None, :]).reshape(b, hw, -1)
    dvol = jnp.zeros((b, hw, hk * wk), dtype)
    dvol = jax.vmap(
        lambda dv, ix, gv: dv.at[jnp.arange(hw)[:, None], ix].add(gv)
    )(dvol, flat, g.reshape(b, hw, -1))
    return dvol.reshape(b, hw, hk, wk), jnp.zeros_like(centers)


lookup_level_pallas.defvjp(_lookup_level_fwd, _lookup_level_bwd)
