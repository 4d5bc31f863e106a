import sys; sys.path.insert(0,"/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from liso_tpu.models.raft import RAFT, SmallEncoder, build_corr_pyramid
from liso_tpu.ops.corr_lookup_pallas import lookup_corr_pallas
from liso_tpu.models.pillar_encoder import PillarEncoder
from liso_tpu.models.box_learner import BoxLearner
from liso_tpu.models.slim import SlimModel
from liso_tpu.ops.bev import BevSetup

grid, n, b = 512, 32768, 4
bev = BevSetup(bev_range_m=(100.,100.), grid_size=(grid,grid))
rng = np.random.RandomState(0)
pts = jnp.asarray(rng.uniform(-45,45,(b,n,4)).astype(np.float32))
valid = jnp.ones((b,n), bool)
key = jax.random.PRNGKey(0)

def bench_inloop(name, run, args, n_iter):
    jax.block_until_ready(run(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(*args))
    print(f"{name:28s} {(time.perf_counter()-t0)/n_iter*1000:8.2f} ms/iter", flush=True)

pe = PillarEncoder(bev)
pv = pe.init(key, pts, valid)
img = jax.block_until_ready(pe.apply(pv, pts, valid)[0])
enc = SmallEncoder(128)
ev = enc.init(key, img)
fmap = jax.block_until_ready(enc.apply(ev, img))
pyr = jax.block_until_ready(build_corr_pyramid(fmap, fmap))
h = grid//8
co0 = jnp.asarray(rng.uniform(0, h, (b,h,h,2)).astype(np.float32))

@jax.jit
def run_lookup(co, pyr):
    def body(i, c):
        return co0 + 1e-6*lookup_corr_pallas(pyr, c)[..., :2]
    return jax.lax.fori_loop(0, 10, body, co)
bench_inloop("lookup pallas", run_lookup, (co0, pyr), 10)

raft = RAFT(num_iters=6, resolution_m=100./grid)
rv = raft.init(key, img, img)
@jax.jit
def run_raft(x, rv):
    def body(i, xx):
        return xx + 0.0*raft.apply(rv, xx, xx, upsample_all=False).sum()
    return jax.lax.fori_loop(0, 4, body, x)
bench_inloop("RAFT 6it", run_raft, (img, rv), 4)

det = BoxLearner(bev, network="centerpoint", use_baseline_parameters=True)
dv = det.init(key, pts, valid)
@jax.jit
def run_det(x, dv):
    def body(i, xx):
        return xx + 0.0*det.apply(dv, xx, valid)[0].pos.sum()
    return jax.lax.fori_loop(0, 5, body, x)
bench_inloop("detector", run_det, (pts, dv), 5)

slim = SlimModel(bev=bev, num_iters=6)
sv = slim.init(key, pts, valid, pts, valid)
@jax.jit
def run_slim(x, sv):
    def body(i, xx):
        return xx + 0.0*slim.apply(sv, xx, valid, pts, valid, backward=False, upsample_all=False)[0].sum()
    return jax.lax.fori_loop(0, 3, body, x)
bench_inloop("SLIM fw-only", run_slim, (pts, sv), 3)
