import sys; sys.path.insert(0,"/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from liso_tpu.ops.corr_lookup_pallas import lookup_corr_pallas, lookup_level_pallas
from liso_tpu.models.raft import build_corr_pyramid

b, hw, hk, wk = 4, 4096, 64, 64
rng = np.random.RandomState(0)
fmap = jnp.asarray(rng.randn(b, 64, 64, 16).astype(np.float32))
pyr = jax.block_until_ready(build_corr_pyramid(fmap, fmap, 4))
co0 = jnp.asarray(rng.uniform(0, 64, (b, 64, 64, 2)).astype(np.float32))

def bench_all_levels(name, lookup_fn, n=20):
    @jax.jit
    def run(co, pyr):
        def body(i, c):
            out = lookup_fn(pyr, c)
            return co0 + 1e-6*out[..., :2]
        return jax.lax.fori_loop(0, n, body, co)
    jax.block_until_ready(run(co0, pyr))
    t0 = time.perf_counter()
    jax.block_until_ready(run(co0, pyr))
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

bench_all_levels("current (fori per pixel)", lookup_corr_pallas)

# variant: unrolled inner loop, 8 pixels per fori iteration
def _k3(scal_ref, vol_ref, out_ref, *, win, unroll=8):
    tile = vol_ref.shape[1]
    def body(j, _):
        for u in range(unroll):
            i = j*unroll + u
            r = scal_ref[0, i, 0].astype(jnp.int32)
            c = scal_ref[0, i, 1].astype(jnp.int32)
            fr = scal_ref[0, i, 2]; fc = scal_ref[0, i, 3]
            rows = vol_ref[0, i, pl.ds(r, win + 1), :]
            rb = rows[:win] * (1 - fr) + rows[1:] * fr
            rolled = pltpu.roll(rb, shift=-c, axis=1)
            out_ref[0, i, :, :] = rolled[:, :win]*(1-fc) + rolled[:, 1:win+1]*fc
        return 0
    jax.lax.fori_loop(0, tile // unroll, body, 0)

@partial(jax.jit, static_argnames=("radius","tile"))
def lookup_level_v3(vol, centers, radius=3, tile=64):
    b, hw, hk, wk = vol.shape
    win = 2*radius+1; pad = win+1
    lanes = -(-(wk+2*pad)//128)*128
    r = centers[...,0]; c = centers[...,1]
    r0 = jnp.floor(r).astype(jnp.int32); c0 = jnp.floor(c).astype(jnp.int32)
    fr = r-r0; fc = c-c0
    rs = jnp.clip(r0-radius+pad, 0, hk+2*pad-(win+1))
    cs = jnp.clip(c0-radius+pad, 0, wk+2*pad-(win+1))
    volp = jnp.pad(vol, ((0,0),(0,0),(pad,pad),(pad,lanes-wk-pad)), mode="edge")
    hp = hk+2*pad
    n_tiles = hw//tile
    scal = jnp.stack([rs.astype(vol.dtype), cs.astype(vol.dtype),
                      fr.astype(vol.dtype), fc.astype(vol.dtype)]
                     + [jnp.zeros_like(fr, vol.dtype)]*4, -1)
    out = pl.pallas_call(
        partial(_k3, win=win), grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1,tile,8), lambda ib,it:(ib,it,0)),
                  pl.BlockSpec((1,tile,hp,lanes), lambda ib,it:(ib,it,0,0))],
        out_specs=pl.BlockSpec((1,tile,win,win), lambda ib,it:(ib,it,0,0)),
        out_shape=jax.ShapeDtypeStruct((b,hw,win,win), vol.dtype),
    )(scal, volp.reshape(b, n_tiles*tile, hp, lanes))
    return out.reshape(b, hw, win*win)

def lookup_v3(pyramid, coords, radius=3):
    bb, h, w, _ = coords.shape
    outs = []
    for lvl, corr in enumerate(pyramid):
        centers = coords.reshape(bb, h*w, 2) / (2.0**lvl)
        outs.append(lookup_level_v3(corr, centers, radius=radius))
    return jnp.concatenate(outs, -1).reshape(bb, h, w, len(pyramid)*49)

ref = np.asarray(lookup_corr_pallas(pyr, co0))
v3 = np.asarray(lookup_v3(pyr, co0))
print("v3 max diff:", np.abs(ref-v3).max(), flush=True)
bench_all_levels("v3 unroll8 + blend-first", lookup_v3)
