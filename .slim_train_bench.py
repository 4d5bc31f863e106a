import sys; sys.path.insert(0,"/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from liso_tpu.data.sample import FlowSample, PointCloud
from liso_tpu.losses.slim_loss import SlimLossCfg
from liso_tpu.ops.bev import BevSetup
from liso_tpu.train.slim_train import SlimTrainer

grid, n, b = 512, 32768, 1
bev = BevSetup((100., 100.), (grid, grid))
rng = np.random.RandomState(0)
mk = lambda: PointCloud(jnp.asarray(rng.uniform(-45,45,(b,n,4)).astype(np.float32)),
                        jnp.ones((b,n), bool))
eye = jnp.tile(jnp.eye(4)[None], (b,1,1))
batch = FlowSample(pcl_t0=mk(), pcl_t1=mk(), odom_t0_t1=eye, odom_t1_t0=eye)
tr = SlimTrainer(bev, num_iters=6,
                 predict_weight_for_static_aggregation="sigmoid",
                 use_static_aggr_flow_for_aggr_flow=True,
                 loss_cfg=SlimLossCfg(knn_chunk=2048),
                 num_train_samples=20000, warmup_steps=2000, train_steps=150000)
state = tr.init_state(jax.random.PRNGKey(0), batch)
print("compiling train step...", flush=True)
state, m = tr.train_step(state, batch)
jax.block_until_ready(state.params)
print("compiled; timing 10 chained steps", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    state, m = tr.train_step(state, batch)
jax.block_until_ready(state.params)
dt = (time.perf_counter()-t0)/10
print(f"SLIM train step (512 grid, bs1, fw+bw, 6 iters, kNN loss): {dt*1000:.0f} ms -> {1/dt:.2f} steps/s", flush=True)
print(f"reference: ~1.7 steps/s on V100 at 920 grid, ~equivalent workload at 512")
