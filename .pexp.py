import sys; sys.path.insert(0,"/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

B, N, C = 4, 32768, 64
H = W = 512
NC = H * W
rng = np.random.RandomState(0)
cid = np.sort(rng.randint(0, NC, (B, N)), axis=1).astype(np.int32)
vals = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
cidj = jnp.asarray(cid)

def bench(name, step, x0, n=15):
    @jax.jit
    def run(x, cidj):
        def body(i, xx):
            out = step(xx, cidj)
            return x0 + 1e-6 * out[:, :N] if out.shape[1] >= N else x0 + 1e-6*out.sum(1, keepdims=True)
        return jax.lax.fori_loop(0, n, body, x)
    jax.block_until_ready(run(x0, cidj))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0, cidj))
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

# baseline: vmapped sorted segment_max into grid
def seg_max(v, cid):
    def per(vi, ci):
        return jax.ops.segment_max(vi, ci, num_segments=NC + 1,
                                   indices_are_sorted=True)[:NC]
    g = jax.vmap(per)(v, cid)
    return jnp.where(jnp.isfinite(g), g, 0.0)

# log-shift run max + one scatter of run starts
def logmax_scatter(v, cid):
    y = v
    for k in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024):
        same = cid[:, k:] == cid[:, :-k]
        shifted = y[:, :-k]
        y = y.at[:, k:].max(jnp.where(same[..., None], shifted, -jnp.inf))
    # run END holds the max of the run; scatter run-end rows
    is_end = jnp.concatenate([cid[:, 1:] != cid[:, :-1],
                              jnp.ones((B, 1), bool)], axis=1)
    tgt = jnp.where(is_end, cid, NC)
    def per(yi, ti):
        g = jnp.zeros((NC + 1, C), yi.dtype)
        return g.at[ti].max(yi, mode="drop", unique_indices=True)[:NC]
    return jax.vmap(per)(y, tgt)

# correctness
a = np.asarray(seg_max(vals, cidj))
bq = np.asarray(logmax_scatter(vals, cidj))
occ = np.zeros((B, NC), bool)
for i in range(B): occ[i, cid[i]] = True
print("equal on occupied:", np.allclose(a[occ], bq[occ], atol=1e-5), flush=True)

bench("segment_max sorted (current)", seg_max, vals)
bench("log-shift max + unique scatter", logmax_scatter, vals)
