"""Pallas TPU kernel for the RAFT correlation window lookup.

The XLA formulation (models/raft.lookup_corr) gathers 64 scalars per pixel
per level — gather-op overhead bound (~17 ms/level at 512 grid), not
bandwidth bound. This kernel streams each pixel's own correlation map
through VMEM and extracts the (2r+1)^2 window directly. v2 design (all four
pyramid levels fused in one kernel):

  * the volume is edge-padded by PAD = win+1 rows/cols (so clamped slice
    starts reproduce per-index clipping exactly) and stored in BFLOAT16 —
    correlation features feed a bf16 conv anyway, and the volume stream is
    the kernel's bandwidth floor (~1.5 GB/iteration in fp32 at 512 grid);
  * rows: one dynamic-slice of win+1=8 sublanes; the row pair is blended
    with the pixel's row fraction (all 49 offsets share the fractions);
  * cols: the lane dimension cannot be dynamically sliced, so the row block
    is circularly rolled by -col_start (dynamic shifts are supported),
    putting the window at lanes 0..7, then lane-blended;
  * the blended [7, 7] window (7 sublanes x 7 lanes) is flattened into ONE
    lane-row with a strided roll (row k shifts by 7k) + sublane reduction,
    so the output is [B, HW, 4*128] with level l's 49 taps at lanes
    l*128..l*128+48 — a dense layout; the previous [B, HW, 7, 7] output
    tiled each window to (8, 128) in HBM, an 18x write blowup.

Behavioral reference: liso/slim/model/raft_code/corr.py:6-56 (CorrBlock
bilinear grid_sample lookup). Differentiable wrt the volumes only (RAFT
detaches flow before every lookup, raft_mod.py:187-195).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _fused_kernel(scal_ref, *refs, num_levels, win, unroll=8):
    vol_refs = refs[:num_levels]
    out_ref = refs[num_levels]
    tile = out_ref.shape[1]
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (win + 1, LANES), 1)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (win + 1, LANES), 0)
    keep = (lane_i < win) & (sub_i < win)

    def body(jj, _):
        for lvl in range(num_levels):
            ys = []
            for u in range(unroll):
                i = jj * unroll + u
                rs = scal_ref[0, i, 4 * lvl + 0].astype(jnp.int32)
                cs = scal_ref[0, i, 4 * lvl + 1].astype(jnp.int32)
                fr = scal_ref[0, i, 4 * lvl + 2]
                fc = scal_ref[0, i, 4 * lvl + 3]
                # bf16 dynamic sublane slices must start at multiples of 8:
                # load 16 rows from the aligned floor, roll the skew away
                rs_al = (rs // 8) * 8
                rows16 = vol_refs[lvl][
                    0, i, pl.ds(rs_al, 2 * (win + 1)), :
                ].astype(jnp.float32)  # rotate needs 32-bit data
                rows16 = pltpu.roll(rows16, -(rs - rs_al), axis=0)
                rows = rows16[: win + 1]  # [8, 128]
                # row blend: row k <- rows[k]*(1-fr) + rows[k+1]*fr
                rb = rows * (1 - fr) + pltpu.roll(rows, win, axis=0) * fr
                # bring window cols to lanes 0..7, then lane blend
                rolled = pltpu.roll(rb, -cs, axis=1)
                cb = rolled * (1 - fc) + pltpu.roll(
                    rolled, LANES - 1, axis=1
                ) * fc
                cb = jnp.where(keep, cb, 0.0)
                # pack [7 sublanes, 7 lanes] -> one lane-row (row k -> +7k)
                packed = pltpu.roll(
                    cb, 0, axis=1, stride=win, stride_axis=0
                )
                ys.append(jnp.sum(packed, axis=0, keepdims=True))
            # aligned [unroll, 128] store (single-sublane dynamic stores
            # are not supported)
            out_ref[
                0,
                pl.ds(jj * unroll, unroll),
                pl.ds(lvl * LANES, LANES),
            ] = jnp.concatenate(ys, axis=0)
        return 0

    jax.lax.fori_loop(0, tile // unroll, body, 0)


def prepare_corr_volumes(pyramid, radius: int = 3):
    """Pad + cast the pyramid ONCE for repeated kernel lookups (RAFT calls
    the lookup 6x per flow pass on the same volumes; the caller hoists this
    instead of relying on XLA CSE). Returns (volps, shapes)."""
    win = 2 * radius + 1
    pad = win + 1
    volps = []
    shapes = []
    for vol in pyramid:
        hk, wk = vol.shape[-2:]
        # rows: window region hk+2*pad, plus 8 tail rows so the 8-aligned
        # 16-row load never overruns (values beyond hp are never used)
        hp_eff = hk + 2 * pad
        hp_pad = -(-hp_eff // 8) * 8 + 8
        volp = jnp.pad(
            vol.astype(jnp.bfloat16),
            (
                (0, 0),
                (0, 0),
                (pad, hp_pad - hk - pad),
                (pad, LANES - wk - pad),
            ),
            mode="edge",
        )
        volps.append(volp)
        shapes.append((hk, wk))
    return tuple(volps), tuple(shapes)


@partial(jax.jit, static_argnames=("shapes", "radius", "tile"))
def _fused_fwd_impl(volps, centers_list, shapes, radius: int = 3,
                    tile: int = 64):
    """volps: prepared padded volumes; centers_list: per-level [B, HW, 2];
    shapes: per-level (hk, wk). Returns [B, HW, L*(2r+1)^2] f32."""
    num_levels = len(volps)
    b, hw = volps[0].shape[:2]
    win = 2 * radius + 1
    pad = win + 1

    scal_ch = []
    for (hk, wk), centers in zip(shapes, centers_list):
        r = centers[..., 0]
        c = centers[..., 1]
        r0 = jnp.floor(r).astype(jnp.int32)
        c0 = jnp.floor(c).astype(jnp.int32)
        rs = jnp.clip(r0 - radius + pad, 0, hk + 2 * pad - (win + 1))
        cs = jnp.clip(c0 - radius + pad, 0, wk + 2 * pad - (win + 1))
        scal_ch += [
            rs.astype(jnp.float32),
            cs.astype(jnp.float32),
            (r - r0).astype(jnp.float32),
            (c - c0).astype(jnp.float32),
        ]
    volps = list(volps)

    tile = max(8, (min(tile, hw) // 8) * 8)
    hw_pad = -(-hw // tile) * tile
    if hw_pad != hw:
        volps = [
            jnp.pad(v, ((0, 0), (0, hw_pad - hw), (0, 0), (0, 0)))
            for v in volps
        ]
        scal_ch = [jnp.pad(s, ((0, 0), (0, hw_pad - hw))) for s in scal_ch]
    n_tiles = hw_pad // tile
    scalars = jnp.stack(scal_ch, axis=-1)  # [B, HW, 4L]

    out = pl.pallas_call(
        partial(_fused_kernel, num_levels=num_levels, win=win),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile, 4 * num_levels), lambda ib, it: (ib, it, 0)
            )
        ]
        + [
            pl.BlockSpec(
                (1, tile, v.shape[2], LANES), lambda ib, it: (ib, it, 0, 0)
            )
            for v in volps
        ],
        out_specs=pl.BlockSpec(
            (1, tile, num_levels * LANES), lambda ib, it: (ib, it, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hw_pad, num_levels * LANES), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(scalars, *volps)
    # lanes l*128..l*128+49 hold level l's taps
    return jnp.concatenate(
        [
            out[:, :hw, lvl * LANES : lvl * LANES + win * win]
            for lvl in range(num_levels)
        ],
        axis=-1,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lookup_fused(volps, centers_list, shapes, radius):
    return _fused_fwd_impl(volps, centers_list, shapes, radius)


def _lookup_fused_fwd(volps, centers_list, shapes, radius):
    out = _fused_fwd_impl(volps, centers_list, shapes, radius)
    # residuals must be jax types; padded shapes/dtype are recomputed in bwd
    return out, centers_list


def _lookup_fused_bwd(shapes, radius, res, cot):
    """Per level: scatter-add the 4 bilinear-shifted cotangent views into
    each pixel's own (hk, wk) map (the edge-clipped adjoint of the window
    blend, in ORIGINAL map coordinates), then embed zero-padded into the
    prepared volume's shape — prepare_corr_volumes' own edge-pad VJP is
    then the identity on the interior."""
    centers_list = res
    win = 2 * radius + 1
    pad = win + 1
    dvolps = []
    for lvl, ((hk, wk), centers) in enumerate(zip(shapes, centers_list)):
        dtype = jnp.float32
        b, hw = centers.shape[:2]
        g = cot[..., lvl * win * win : (lvl + 1) * win * win]
        r = centers[..., 0]
        c = centers[..., 1]
        r0 = jnp.floor(r).astype(jnp.int32)
        c0 = jnp.floor(c).astype(jnp.int32)
        fr = (r - r0)[..., None, None]
        fc = (c - c0)[..., None, None]
        cotw = g.reshape(b, hw, win, win).astype(dtype)
        gg = jnp.zeros((b, hw, win + 1, win + 1), dtype)
        gg = gg.at[..., :win, :win].add(cotw * (1 - fr) * (1 - fc))
        gg = gg.at[..., :win, 1:].add(cotw * (1 - fr) * fc)
        gg = gg.at[..., 1:, :win].add(cotw * fr * (1 - fc))
        gg = gg.at[..., 1:, 1:].add(cotw * fr * fc)
        d = jnp.arange(-radius, radius + 2, dtype=jnp.int32)
        rows = jnp.clip(r0[..., None] + d, 0, hk - 1)
        cols = jnp.clip(c0[..., None] + d, 0, wk - 1)
        flat = (rows[..., :, None] * wk + cols[..., None, :]).reshape(
            b, hw, -1
        )
        dvol = jnp.zeros((b, hw, hk * wk), dtype)
        dvol = jax.vmap(
            lambda dv, ix, gv: dv.at[jnp.arange(hw)[:, None], ix].add(gv)
        )(dvol, flat, gg.reshape(b, hw, -1))
        dvol = dvol.reshape(b, hw, hk, wk)
        hp_pad = -(-(hk + 2 * pad) // 8) * 8 + 8  # as prepare_corr_volumes
        dvolp = jnp.pad(
            dvol,
            (
                (0, 0),
                (0, 0),
                (pad, hp_pad - hk - pad),
                (pad, LANES - wk - pad),
            ),
        ).astype(jnp.bfloat16)
        dvolps.append(dvolp)
    return tuple(dvolps), None


_lookup_fused.defvjp(_lookup_fused_fwd, _lookup_fused_bwd)


def lookup_prepared(prepared, coords, radius: int = 3):
    """Window lookup from volumes prepared ONCE with prepare_corr_volumes
    (RAFT hoists the pad/cast out of its 6-iteration loop)."""
    volps, shapes = prepared
    b, h, w, _ = coords.shape
    centers_list = tuple(
        coords.reshape(b, h * w, 2) / (2.0**lvl) for lvl in range(len(volps))
    )
    out = _lookup_fused(volps, centers_list, shapes, radius)
    return out.reshape(b, h, w, -1)


def lookup_corr_pallas(pyramid, coords, radius: int = 3):
    """Drop-in one-shot API (prepares volumes per call): prefer
    prepare_corr_volumes + lookup_prepared inside iteration loops."""
    return lookup_prepared(
        prepare_corr_volumes(pyramid, radius), coords, radius
    )
