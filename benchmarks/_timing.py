"""Hardened chained-timing helpers for the virtualized TPU tunnel.

Two tunnel artifacts make naive timing lie (see docs/STATUS.md round-3):

  * `block_until_ready` can return EARLY for shallow dispatch queues
    (measured: a 1-iteration chain "completes" in 0.13 ms, then the host
    copy takes 3.5 s) — so every measurement here forces completion by
    materializing one tiny output slice on the host;
  * per-dispatch overhead and pipeline fill distort short runs — so the
    reported per-iteration cost is the SLOPE between a low and a high
    iteration count: (T(hi) - T(lo)) / (hi - lo), which cancels constant
    overheads on both ends.

Usage:
    ms = chain_slope(fn, seed_args, mix)   # ms per fn() application
"""
from __future__ import annotations

import time

import numpy as np


def _make_run(fn, mix, iters):
    import jax

    @jax.jit
    def run(*args):
        def body(_, a):
            return mix(fn(*a), a)

        return jax.lax.fori_loop(0, iters, body, args)

    return run


def _first_leaf_slice(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            flat = leaf.reshape(-1)
            return np.asarray(flat[:1])
    return None


def _timed(run, seed_args):
    import jax

    out = run(*seed_args)
    jax.block_until_ready(out)
    _first_leaf_slice(out)  # force true completion through the tunnel
    t0 = time.perf_counter()
    out = run(*seed_args)
    jax.block_until_ready(out)
    _first_leaf_slice(out)
    return time.perf_counter() - t0


def chain_slope(fn, seed_args, mix, lo: int = 10, hi: int = 50) -> float:
    """ms per fn() application, measured as the slope between a lo- and a
    hi-iteration chained run (each chain is ONE jit; `mix(out, args)` must
    thread a real data dependency from fn's output into the next args)."""
    t_lo = _timed(_make_run(fn, mix, lo), seed_args)
    t_hi = _timed(_make_run(fn, mix, hi), seed_args)
    return (t_hi - t_lo) / (hi - lo) * 1e3
