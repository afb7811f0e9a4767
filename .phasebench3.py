import time
import jax, jax.numpy as jnp
from slam_uwv_kalman_filters_tpu.models import pose_fused as pf
from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf
from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn
from slam_uwv_kalman_filters_tpu.ops import kernels
from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod
from slam_uwv_kalman_filters_tpu.utils.config import default_pose_ukf_config

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
NB = 32768
dtype = jnp.float32
cfg = default_pose_ukf_config()
model = dyn.default_uwv_parameters(dtype=dtype)
state, params = pukf.init_from_pose(
    imu_in_nwu_pos=jnp.zeros(3, dtype), imu_in_nwu_pos_cov=jnp.eye(3, dtype=dtype) * 0.01,
    imu_in_nwu_rot=jnp.array([1.0, 0, 0, 0], dtype), imu_in_nwu_rot_cov=jnp.eye(3, dtype=dtype) * 1e-4,
    config=cfg, model_parameters=model, imu_delta_t=0.01, dtype=dtype)
state = pukf.integrate_rotation_rate(state, jnp.array([0.0, 0.0, 0.01], dtype))
bstate = bankmod.replicate(state, NB)
ls = jax.block_until_ready(pf.to_lanes(bstate))
cov_t = ls.cov_t
z = jnp.tile(jnp.array([0.3, 0.0, 0.0], dtype)[None], (NB, 1))
r = jnp.tile((jnp.eye(3, dtype=dtype) * 1e-3)[None], (NB, 1, 1))

def timeit_chain(name, fn, x0, iters=30):
    """fn: x -> x (same shape), chained so runs serialize without host syncs."""
    jfn = jax.jit(fn)
    x = jax.block_until_ready(jfn(x0))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = jfn(x)
    jax.block_until_ready(jax.tree_util.tree_leaves(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return dt

# 1. sigma-deltas: chain cov -> deltas -> pseudo-cov (cheap reduce back to (53,53,B))
def sd_chain(c):
    d = kernels._sigma_deltas_lanes(c, interpret=False)          # (107,53,B)
    # cheap rank-1-ish feedback keeping the value scale stable, forces full d
    return c + 0.0 * d[0:53] * d[54:107]
t_sd = timeit_chain("sigma_deltas (chained)", sd_chain, cov_t)

# HBM floor: read+write the cov tensor with trivial math
t_cp = timeit_chain("copy floor cov (53,53,B)", lambda c: c * 1.0000001, cov_t)

# 2. predict chained on lanes state
t_pred = timeit_chain("predict_lanes (chained)", lambda l: pf.predict_lanes(l, params, 0.01), ls)
# 3. update chained
t_upd = timeit_chain("update_velocity_lanes (chained)", lambda l: puf.update_velocity_lanes(l, params, z, r, None)[0], ls)
# 4. both
def two(l):
    l = pf.predict_lanes(l, params, 0.01)
    return puf.update_velocity_lanes(l, params, z, r, None)[0]
t_two = timeit_chain("2-launch step (chained)", two, ls)
print(f"\nA={t_sd*1e3:.3f}  pred-A={1e3*(t_pred-t_sd):.3f}  upd-A={1e3*(t_upd-t_sd):.3f}")
