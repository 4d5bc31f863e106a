"""Pallas TPU kernels for dense-BEV-grid scatter/gather over SORTED cell ids.

Replaces `jax.ops.segment_{sum,max}` and grid row-gathers on the pillar path
(reference equivalents: mmcv `Voxelization`+`PointPillarsScatter`,
liso/networks/pcl_to_feature_grid/pcl_to_feature_grid.py:24-54, and the
numpy/torch scatters in liso/utils/numpy_scatter.py:4-26). On this TPU, XLA
scatter (47 ms for 32k x 64ch -> 262k cells at batch 8), XLA row gathers
(~1 us/row), and per-point read-modify-writes in a kernel (~0.5 us/point)
are all latency-bound. These kernels are throughput-bound instead: the
scatter is a ONE-HOT MATMUL on the MXU.

  * the flat grid is tiled (T cells); each tile's contiguous range of sorted
    points is found with a host-side searchsorted (scalar-prefetched);
  * per 128-point chunk, onehot[p, t] = (cells[p] == tile_base + t) is built
    with a broadcasted-iota compare and the scatter-add is
    acc += onehot^T @ feats  (exact: onehot is 0/1, fp32 accumulate);
  * scatter-max runs a segmented scan-max along the sublane (point) axis
    first (log2 K shifted maxima), after which the LAST point of each
    segment holds the segment max; the boundary-masked onehot matmul then
    places exactly one row per cell, so the same matmul applies;
  * the per-point gather is the transpose: out = onehot @ grid_tile.

API (batched; cell ids MUST be ascending per sample; the drop bucket
id >= num_cells sorts last and never matches a onehot column):

  grid_reduce(feats [B,N,C], cells [B,N], num_cells, op='add'|'max')
      -> [B, num_cells, C]        (empty cells: 0)
  grid_gather(grid [B,NC,C], cells [B,N]) -> [B, N, C]   (drop bucket -> 0)

Both are differentiable: grid_reduce('add') and grid_gather are mutual
adjoints; 'max' routes cotangents to per-(cell,channel) maxima by equality
(ties split like XLA's segment_max VJP).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per chunk (lane-rows of sorted cell ids; must be a multiple of
# _SUB). Smaller K cuts the nc*K term of the one-hot mask/matmul work AND
# the K*log2(K) segmented-scan work per pair: measured on-chip at bench
# scale (512^2 grid, b8, 32k pts, max+occ) K=128/tile=1024 runs 7.6 ms vs
# 10.9 ms for the original K=512 — see docs/STATUS.md round-5.
_K = int(os.environ.get("LISO_GRID_K", "128"))
_SUB = 128  # lane-row width
_NEG = -3.0e38  # -inf stand-in that survives fp32 matmul masking


def _pick_tile(num_cells: int) -> int:
    """Cell-tile size. The grid row count is PADDED up to a tile multiple
    (_pad_cells) rather than the tile shrunk to a divisor — non-power-of-2
    grids like the reference's 920^2 (846400 cells) previously fell back
    to tile=64 and 13k kernel programs."""
    import os

    return int(os.environ.get("LISO_GRID_TILE", "1024"))


def _padded_cells(num_cells: int, tile: int) -> int:
    return -(-num_cells // tile) * tile


def scatter_analytic_flops(num_cells: int, n_pts: int, channels: int) -> int:
    """Executed MXU FLOPs upper bound for ONE grid_reduce/scatter call,
    PER BATCH ELEMENT (the kernel grid is (batch, tiles); multiply by the
    batch size at the call site).
    Per visited (chunk, tile) pair the kernel runs a one-hot
    [tile, _K] x [_K, lanes] matmul; the chunk count is data-dependent but
    contiguous sorted ranges bound it by n_pts/_K + n_tiles (uniform
    clouds saturate the bound). Channels execute at MXU lane granularity
    (128), so a C=65 call costs the same as C=128. Uses the kernel's own
    _pick_tile so benchmark accounting can never drift from the actual
    tiling (bench.py, benchmarks/mfu_bench.py import this)."""
    tile = _pick_tile(num_cells)
    lanes = -(-channels // _SUB) * _SUB
    chunks = n_pts // _K + _padded_cells(num_cells, tile) // tile
    return 2 * chunks * tile * _K * lanes


def _reduce_kernel(starts_ref, cells_ref, feats_ref, out_ref, occ_ref=None,
                   *, op, tile, prec):
    ib = pl.program_id(0)
    it = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    init = 0.0 if op == "add" else _NEG
    out_ref[...] = jnp.full(out_ref.shape, init, out_ref.dtype)
    if occ_ref is not None:
        occ_ref[...] = jnp.zeros(occ_ref.shape, occ_ref.dtype)
    lo = starts_ref[ib * (n_tiles + 1) + it]
    hi = starts_ref[ib * (n_tiles + 1) + it + 1]
    base = it * tile

    # onehot built directly TRANSPOSED ([tile, K]): iota over sublanes vs the
    # raw lane-row of cell ids — no cross-lane transposes on the add path
    row_t = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + base

    def chunk_body(k, _):
        rows = [
            cells_ref[0, pl.ds(k * (_K // _SUB) + j, 1), :]
            for j in range(_K // _SUB)
        ]  # each [1, _SUB]
        ohT = jnp.concatenate(
            [(row_t == r).astype(out_ref.dtype) for r in rows], axis=1
        )  # [tile, K]
        feats = feats_ref[0, pl.ds(k * _K, _K), :]  # [K, C]
        if occ_ref is not None and op == "add":
            # occupancy rides the SAME one-hot masks — the separate
            # C=1 count kernel call (and its full mask rebuild) is free'd
            cov = jnp.sum(ohT.astype(jnp.float32), axis=1)[:, None]
            occ_ref[0, :, :] = jnp.maximum(
                occ_ref[0, :, :], (cov > 0.5).astype(occ_ref.dtype)
            )
        if op == "add":
            out_ref[0, :, :] += jax.lax.dot_general(
                ohT,
                feats,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).astype(out_ref.dtype)
        else:
            # segmented running max along sublanes (points are sorted);
            # the scan needs per-sublane segment ids -> transpose the rows
            seg = jnp.concatenate(
                [jnp.transpose(r) for r in rows], axis=0
            )  # [K, 1]
            row_i = jax.lax.broadcasted_iota(jnp.int32, (_K, 1), 0)
            v = feats.astype(jnp.float32)  # rotate needs 32-bit data
            shift = 1
            while shift < _K:
                vs = pltpu.roll(v, shift, axis=0)  # row p <- row p-shift
                ss = pltpu.roll(seg, shift, axis=0)
                same = (ss == seg) & (row_i >= shift)
                v = jnp.where(same, jnp.maximum(v, vs), v)
                shift *= 2
            # boundary = last point of its segment within this chunk
            nxt = pltpu.roll(seg, _K - 1, axis=0)  # row p <- row p+1
            boundary = (nxt != seg) | (row_i == _K - 1)
            ohT = ohT * jnp.transpose(boundary.astype(out_ref.dtype))
            placed = jax.lax.dot_general(
                ohT,
                jnp.where(boundary, v, 0.0).astype(out_ref.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).astype(out_ref.dtype)
            covered = jnp.sum(ohT.astype(jnp.float32), axis=1)[:, None] > 0.5
            out_ref[0, :, :] = jnp.maximum(
                out_ref[0, :, :], jnp.where(covered, placed, _NEG)
            ).astype(out_ref.dtype)
            if occ_ref is not None:
                # reuse the boundary-masked coverage the max placement
                # already computed (every segment has exactly one
                # boundary point, so the covered cell set is identical)
                occ_ref[0, :, :] = jnp.maximum(
                    occ_ref[0, :, :], covered.astype(occ_ref.dtype)
                )
        return 0

    jax.lax.fori_loop(lo // _K, (hi + _K - 1) // _K, chunk_body, 0)
    if op == "max":
        # zero empty cells HERE, in VMEM, while the tile is resident —
        # doing it as an XLA epilogue streams the full [B, NC, C] grid
        # through HBM twice more (~1 GB at bench scale, ~2.5 ms)
        o = out_ref[0, :, :].astype(jnp.float32)  # bf16 cmpf unsupported
        out_ref[0, :, :] = jnp.where(o <= 0.5 * _NEG, 0.0, o).astype(
            out_ref.dtype
        )


def _reduce_kernel_c1(starts_ref, cells_ref, vals_ref, out_ref, *, tile):
    """Scatter-add of SCALAR per-point values (C == 1). The generic kernel
    would lane-pad the [N, 1] feature block 1 -> 128 (128x VMEM + DMA
    waste; at N = 131k fp32 that alone is 2 x 67 MB and OOMs VMEM), so the
    values ride the SAME [N/_SUB, _SUB] layout as the cell ids and the
    reduction is a masked lane-sum instead of a matmul."""
    ib = pl.program_id(0)
    it = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    lo = starts_ref[ib * (n_tiles + 1) + it]
    hi = starts_ref[ib * (n_tiles + 1) + it + 1]
    base = it * tile
    row_t = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + base

    def chunk_body(k, _):
        js = range(_K // _SUB)
        rows = [cells_ref[0, pl.ds(k * (_K // _SUB) + j, 1), :] for j in js]
        vrows = [vals_ref[0, pl.ds(k * (_K // _SUB) + j, 1), :] for j in js]
        placed = jnp.concatenate(
            [
                jnp.where(row_t == r, v.astype(jnp.float32), 0.0)
                for r, v in zip(rows, vrows)
            ],
            axis=1,
        )  # [tile, K] each point's value at its own cell row
        out_ref[0, :, :] += jnp.sum(placed, axis=1, keepdims=True).astype(
            out_ref.dtype
        )
        return 0

    jax.lax.fori_loop(lo // _K, (hi + _K - 1) // _K, chunk_body, 0)


def _gather_kernel(starts_ref, cells_ref, grid_ref, out_ref, *, tile, prec):
    ib = pl.program_id(0)
    it = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(it == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    lo = starts_ref[ib * (n_tiles + 1) + it]
    hi = starts_ref[ib * (n_tiles + 1) + it + 1]
    base = it * tile
    row_t = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + base

    def chunk_body(k, _):
        rows = [
            cells_ref[0, pl.ds(k * (_K // _SUB) + j, 1), :]
            for j in range(_K // _SUB)
        ]
        ohT = jnp.concatenate(
            [(row_t == r).astype(grid_ref.dtype) for r in rows], axis=1
        )  # [tile, K]
        valsT = jax.lax.dot_general(
            grid_ref[0, :, :],  # [tile, C]
            ohT,  # [tile, K]
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [C, K]
        out_ref[0, pl.ds(k * _K, _K), :] += jnp.transpose(valsT).astype(
            out_ref.dtype
        )
        return 0

    jax.lax.fori_loop(lo // _K, (hi + _K - 1) // _K, chunk_body, 0)


def _tile_starts(cells: jnp.ndarray, num_cells: int, tile: int) -> jnp.ndarray:
    """[B, n_tiles+1] int32 point ranges per grid tile (sorted cells)."""
    n_tiles = num_cells // tile
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile
    starts = jax.vmap(
        lambda c: jnp.searchsorted(c, bounds, side="left")
    )(cells)
    return starts.astype(jnp.int32)


def _pad_points(feats, cells):
    """Pad the point axis to a multiple of _K (pad cells with int32 max,
    which sorts last and never matches a cell column)."""
    n = cells.shape[1]
    np_ = -(-n // _K) * _K
    if np_ != n:
        feats = jnp.pad(feats, ((0, 0), (0, np_ - n), (0, 0)))
        cells = jnp.pad(
            cells, ((0, 0), (0, np_ - n)),
            constant_values=jnp.iinfo(jnp.int32).max,
        )
    return feats, cells, n, np_


@partial(jax.jit, static_argnames=(
    "num_cells", "op", "interpret", "exact", "with_occ"))
def _grid_reduce_impl(feats, cells, num_cells, op="add", interpret=False,
                      exact=True, with_occ=False):
    b = feats.shape[0]
    c = feats.shape[2]
    feats, cells, _, n = _pad_points(feats, cells)
    tile = _pick_tile(num_cells)
    # pad the cell count to a tile multiple; drop-bucket points with ids
    # in [num_cells, nc_pad) land in pad rows that are sliced off below
    nc_pad = _padded_cells(num_cells, tile)
    n_tiles = nc_pad // tile
    starts = _tile_starts(cells, nc_pad, tile).reshape(-1)
    cells2 = cells.reshape(b, n // _SUB, _SUB)
    # HIGHEST (3-pass bf16x) only applies to f32 inputs; for bf16 inputs a
    # single pass IS exact and Mosaic rejects the fp32 contract precision
    prec = (
        jax.lax.Precision.HIGHEST
        if exact and feats.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    if c == 1 and op == "add" and not with_occ:
        # 16-bit values hit Mosaic's sublane-alignment proof on the
        # per-row dynamic loads (bf16 rows need offsets provably %16;
        # the chunk loop steps by _K/_SUB = 4) — 32-bit rows compile.
        # Accumulation is f32 anyway; cast in, cast back at the end.
        vals2 = (
            feats[..., 0].astype(jnp.float32).reshape(b, n // _SUB, _SUB)
        )
        out = pl.pallas_call(
            partial(_reduce_kernel_c1, tile=tile),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, n_tiles),
                in_specs=[
                    pl.BlockSpec(
                        (1, n // _SUB, _SUB), lambda ib, it, s: (ib, 0, 0)
                    ),
                    pl.BlockSpec(
                        (1, n // _SUB, _SUB), lambda ib, it, s: (ib, 0, 0)
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, tile, 1), lambda ib, it, s: (ib, it, 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (b, nc_pad, 1), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(starts, cells2, vals2)
        return out[:, :num_cells].astype(feats.dtype)
    out_specs = pl.BlockSpec((1, tile, c), lambda ib, it, s: (ib, it, 0))
    out_shape = jax.ShapeDtypeStruct((b, nc_pad, c), feats.dtype)
    if with_occ:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, tile, 1), lambda ib, it, s: (ib, it, 0)),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((b, nc_pad, 1), jnp.float32),
        )
    out = pl.pallas_call(
        partial(_reduce_kernel, op=op, tile=tile, prec=prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, n // _SUB, _SUB), lambda ib, it, s: (ib, 0, 0)),
                pl.BlockSpec((1, n, c), lambda ib, it, s: (ib, 0, 0)),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts, cells2, feats)
    occ = None
    if with_occ:
        out, occ = out
        occ = occ[:, :num_cells]
    out = out[:, :num_cells]
    # op == 'max': empty cells are zeroed INSIDE the kernel (VMEM-resident
    # tile), not here — an XLA epilogue would stream the grid twice more
    return (out, occ) if with_occ else out


@partial(jax.jit, static_argnames=("interpret", "exact"))
def _grid_gather_impl(grid, cells, interpret=False, exact=True):
    b, num_cells, c = grid.shape
    n0 = cells.shape[1]
    dummy = jnp.zeros((b, n0, 1), grid.dtype)
    _, cells, _, n = _pad_points(dummy, cells)
    tile = _pick_tile(num_cells)
    # zero-pad grid rows to a tile multiple: drop-bucket points whose ids
    # fall in [num_cells, nc_pad) gather exactly 0, like before
    nc_pad = _padded_cells(num_cells, tile)
    if nc_pad != num_cells:
        grid = jnp.pad(grid, ((0, 0), (0, nc_pad - num_cells), (0, 0)))
    n_tiles = nc_pad // tile
    starts = _tile_starts(cells, nc_pad, tile).reshape(-1)
    cells2 = cells.reshape(b, n // _SUB, _SUB)
    prec = (
        jax.lax.Precision.HIGHEST
        if exact and grid.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        partial(_gather_kernel, tile=tile, prec=prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, n // _SUB, _SUB), lambda ib, it, s: (ib, 0, 0)),
                pl.BlockSpec((1, tile, c), lambda ib, it, s: (ib, it, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, n, c), lambda ib, it, s: (ib, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), grid.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts, cells2, grid)
    return out[:, :n0]


# ---------------------------------------------------------------------------
# Differentiable wrappers
# ---------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grid_reduce(feats, cells, num_cells: int, op: str = "add",
                interpret: bool = False, exact: bool = True):
    """Sorted-segment reduction to a dense grid; see module docstring."""
    return _grid_reduce_impl(feats, cells, num_cells, op, interpret, exact)


def _grid_reduce_fwd(feats, cells, num_cells, op, interpret, exact):
    out = grid_reduce(feats, cells, num_cells, op, interpret, exact)
    res = (cells,) if op == "add" else (cells, feats, out)
    return out, res


def _grid_reduce_bwd(num_cells, op, interpret, exact, res, g):
    if op == "add":
        (cells,) = res
        dfeats = _grid_gather_impl(g, cells, interpret)
    else:
        cells, feats, out = res
        winner = feats == _grid_gather_impl(out, cells, interpret)
        dfeats = jnp.where(
            winner, _grid_gather_impl(g, cells, interpret), 0.0
        )
    return dfeats, None


grid_reduce.defvjp(_grid_reduce_fwd, _grid_reduce_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grid_reduce_with_occ(feats, cells, num_cells: int, op: str = "max",
                         interpret: bool = False, exact: bool = True):
    """grid_reduce that ALSO returns the occupancy grid [B, NC, 1]
    (1.0 where any point landed) from the same kernel pass — the
    occupancy rides the one-hot masks the reduction already builds, so
    the separate C=1 count kernel (a full second mask pass over every
    (chunk, tile) pair) disappears from the pillar-encoder path.
    Occupancy is piecewise-constant in feats: its cotangent is dropped."""
    return _grid_reduce_impl(
        feats, cells, num_cells, op, interpret, exact, with_occ=True
    )


def _grid_reduce_occ_fwd(feats, cells, num_cells, op, interpret, exact):
    out = grid_reduce_with_occ(feats, cells, num_cells, op, interpret, exact)
    grid, occ = out
    res = (cells,) if op == "add" else (cells, feats, grid)
    return out, res


def _grid_reduce_occ_bwd(num_cells, op, interpret, exact, res, g):
    g_grid, _ = g  # occupancy cotangent: constant wrt feats
    if op == "add":
        (cells,) = res
        dfeats = _grid_gather_impl(g_grid, cells, interpret)
    else:
        cells, feats, grid = res
        winner = feats == _grid_gather_impl(grid, cells, interpret)
        dfeats = jnp.where(
            winner, _grid_gather_impl(g_grid, cells, interpret), 0.0
        )
    return dfeats, None


grid_reduce_with_occ.defvjp(_grid_reduce_occ_fwd, _grid_reduce_occ_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grid_gather(grid, cells, interpret: bool = False, exact: bool = True):
    """Per-point row gather from a dense grid (sorted cells; drop bucket
    rows stay 0)."""
    return _grid_gather_impl(grid, cells, interpret, exact)


def _grid_gather_fwd(grid, cells, interpret, exact):
    return (
        _grid_gather_impl(grid, cells, interpret, exact),
        (cells, grid.shape[1]),
    )


def _grid_gather_bwd(interpret, exact, res, g):
    cells, num_cells = res
    return _grid_reduce_impl(g, cells, num_cells, "add", interpret), None


grid_gather.defvjp(_grid_gather_fwd, _grid_gather_bwd)


def use_pallas_grid_ops() -> bool:
    return jax.default_backend() == "tpu"
