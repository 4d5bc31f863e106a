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

def bench_inloop(name, step_fn, x0, n_iter=10):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, n_iter, lambda i, xx: step_fn(xx), x)
    jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    print(f"{name:28s} {(time.perf_counter()-t0)/n_iter*1000:8.2f} ms/iter", flush=True)

pe = PillarEncoder(bev)
pv = pe.init(key, pts, valid)
bench_inloop("pillar_encoder (sorted)", lambda x: x + 0.0*pe.apply(pv, x, valid)[0].sum(), pts, n_iter=6)
img = jax.block_until_ready(pe.apply(pv, pts, valid)[0])
enc = SmallEncoder(128)
ev = enc.init(key, img)
fmap = jax.block_until_ready(enc.apply(ev, img))
pyr = jax.block_until_ready(build_corr_pyramid(fmap, fmap))
h = grid//8
co0 = jnp.asarray(rng.uniform(0, h, (b,h,h,2)).astype(np.float32))
bench_inloop("lookup pallas", lambda c: co0 + 1e-6*lookup_corr_pallas(pyr, c)[..., :2], co0)
raft = RAFT(num_iters=6, resolution_m=100./grid)
rv = raft.init(key, img, img)
bench_inloop("RAFT 6it", lambda x: x + 0.0*raft.apply(rv, x, x, upsample_all=False).sum(), img, n_iter=4)
det = BoxLearner(bev, network="centerpoint", use_baseline_parameters=True)
dv = det.init(key, pts, valid)
bench_inloop("detector", lambda x: x + 0.0*det.apply(dv, x, valid)[0].pos.sum(), pts, n_iter=5)
slim = SlimModel(bev=bev, num_iters=6)
sv = slim.init(key, pts, valid, pts, valid)
bench_inloop("SLIM fw-only", lambda x: x + 0.0*slim.apply(sv, x, valid, pts, valid, backward=False, upsample_all=False)[0].sum(), pts, n_iter=3)
