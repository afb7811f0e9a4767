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

# matmul sanity: 8192x8192 f32 @ HIGHEST — known MXU envelope
a = jnp.ones((8192, 8192), jnp.float32)
timeit_chain("matmul 8192^3 f32 HIGHEST", lambda m: jax.lax.dot(m, m, precision=jax.lax.Precision.HIGHEST) * jnp.float32(1e-9), a, iters=10)
timeit_chain("matmul 8192^3 bf16-default", lambda m: jax.lax.dot(m, m) * jnp.float32(1e-9), a, iters=10)

# sigma-deltas with REAL data feedback (cannot elide, input changes each iter)
def sd_real(c):
    d = kernels._sigma_deltas_lanes(c, interpret=False)
    return c + d[1][None, :, :] * jnp.float32(1e-7)
timeit_chain("sigma_deltas, real feedback", sd_real, cov_t)

# reduction floor over a (107,53,NB) tensor
big = jnp.ones((107, 53, NB), jnp.float32)
timeit_chain("sum( (107,53,32768) ) floor", lambda b: b + b.sum() * jnp.float32(1e-12), big, iters=10)
