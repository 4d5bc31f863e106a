import sys; sys.path.insert(0,"/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from liso_tpu.ops.corr_lookup_pallas import lookup_level_pallas

b, hw, hk, wk = 4, 4096, 64, 64
rng = np.random.RandomState(0)
vol = jnp.asarray(rng.randn(b, hw, hk, wk).astype(np.float32))
centers = jnp.asarray(rng.uniform(-2, hk+2, (b, hw, 2)).astype(np.float32))

def bench(name, f, vol_, cen_, n=20):
    @jax.jit
    def run(v, cen):
        def body(i, c):
            out = f(v, c)
            return cen + 1e-6*out[..., :2]
        return jax.lax.fori_loop(0, n, body, cen)
    jax.block_until_ready(run(vol_, cen_))
    t0 = time.perf_counter()
    jax.block_until_ready(run(vol_, cen_))
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

# current kernel, tiles
for t in (64, 128, 256):
    bench(f"level0 tile={t}", lambda v, c, t=t: lookup_level_pallas(v, c, tile=t), vol, centers)
# bf16
volh = vol.astype(jnp.bfloat16)
bench("level0 bf16 tile=128", lambda v, c: lookup_level_pallas(v, c, tile=128), volh, centers)

# fused variant: row-blend before roll
def _k2(scal_ref, vol_ref, out_ref, *, win):
    tile = vol_ref.shape[1]
    def body(i, _):
        r = scal_ref[0, i, 0].astype(jnp.int32)
        c = scal_ref[0, i, 1].astype(jnp.int32)
        fr = scal_ref[0, i, 2]; fc = scal_ref[0, i, 3]
        rows = vol_ref[0, i, pl.ds(r, win + 1), :]
        rb = rows[:win] * (1 - fr) + rows[1:] * fr        # [7,128]
        rolled = pltpu.roll(rb, shift=-c, axis=1)
        out_ref[0, i, :, :] = rolled[:, :win]*(1-fc) + rolled[:, 1:win+1]*fc
        return 0
    jax.lax.fori_loop(0, tile, body, 0)

@partial(jax.jit, static_argnames=("radius","tile"))
def lookup_v2(vol, centers, radius=3, tile=128):
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
        partial(_k2, win=win), grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1,tile,8), lambda ib,it:(ib,it,0)),
                  pl.BlockSpec((1,tile,hp,lanes), lambda ib,it:(ib,it,0,0))],
        out_specs=pl.BlockSpec((1,tile,win,win), lambda ib,it:(ib,it,0,0)),
        out_shape=jax.ShapeDtypeStruct((b,hw,win,win), vol.dtype),
    )(scal, volp.reshape(b, n_tiles*tile, hp, lanes))
    return out.reshape(b, hw, win*win)

ref = np.asarray(lookup_level_pallas(vol, centers))
v2 = np.asarray(lookup_v2(vol, centers))
print("v2 max diff:", np.abs(ref-v2).max(), flush=True)
bench("level0 v2 (blend-first)", lookup_v2, vol, centers)
