import time
import jax, jax.numpy as jnp
from slam_uwv_kalman_filters_tpu.models import pose_fused as pf
from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
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
bstate = bankmod.replicate(state, NB)
ls = jax.block_until_ready(pf.to_lanes(bstate))
cov_t = ls.cov_t

def timeit_chain(name, fn, x0, iters=30):
    jfn = jax.jit(fn)
    x = jax.block_until_ready(jfn(x0))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = jfn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return dt

# changing input every iteration: scale cov by (1 + 1e-7) — nonzero, data-indep
def sd_changing(c):
    d = kernels._sigma_deltas_lanes(c, interpret=False)
    return c * jnp.float32(1.0 + 1e-7) + jnp.tanh(d[1, 0, 0]) * jnp.float32(0.0)
timeit_chain("sigma_deltas, input CHANGES each iter", sd_changing, cov_t)

# bit-identical input every iteration (suspected artifact mode)
def sd_identical(c):
    d = kernels._sigma_deltas_lanes(c, interpret=False)
    return c + jnp.tanh(d.sum()) * jnp.float32(1e-20)
timeit_chain("sigma_deltas, input IDENTICAL each iter", sd_identical, cov_t)

# copy floor with changing input
timeit_chain("copy floor, changing", lambda c: c * jnp.float32(1.0 + 1e-9), cov_t)
# copy floor, identical input
timeit_chain("copy floor, identical (c+0)", lambda c: c + jnp.float32(0.0), cov_t)
