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

def timeit(name, fn, *args, iters=20):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))
    # block every call — serial per-launch latency
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(jax.tree_util.tree_leaves(jfn(*args)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return dt

timeit("sigma_deltas kernel", lambda c: kernels._sigma_deltas_lanes(c, interpret=False), cov_t)
# reduce the deltas so the full output must materialize
timeit("sigma_deltas + sum", lambda c: kernels._sigma_deltas_lanes(c, interpret=False).sum(), cov_t)
timeit("predict_lanes", lambda l: pf.predict_lanes(l, params, 0.01), ls)
