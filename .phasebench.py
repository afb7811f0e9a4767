"""Microbenchmark: phase cost split of the fused pose step on the real chip.

Times (bank 32768, f32):
  1. sigma-deltas kernel alone          (~phase A)
  2. predict_lanes                      (A + process model B + mean C/D + recon E)
  3. update_velocity_lanes              (A + in-kernel h + update tail)
  4. full 2-launch step                 (2 + 3)
"""
import time

import jax
import jax.numpy as jnp

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
    imu_in_nwu_pos=jnp.zeros(3, dtype),
    imu_in_nwu_pos_cov=jnp.eye(3, dtype=dtype) * 0.01,
    imu_in_nwu_rot=jnp.array([1.0, 0, 0, 0], dtype),
    imu_in_nwu_rot_cov=jnp.eye(3, dtype=dtype) * 1e-4,
    config=cfg,
    model_parameters=model,
    imu_delta_t=0.01,
    dtype=dtype,
)
state = pukf.integrate_rotation_rate(state, jnp.array([0.0, 0.0, 0.01], dtype))
bstate = bankmod.replicate(state, NB)
z = jnp.tile(jnp.array([0.3, 0.0, 0.0], dtype)[None], (NB, 1))
r = jnp.tile((jnp.eye(3, dtype=dtype) * 1e-3)[None], (NB, 1, 1))

ls = jax.block_until_ready(pf.to_lanes(bstate))
cov_t = ls.cov_t  # (53, 53, NB)


def timeit(name, fn, *args, iters=30):
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.3f} ms  ({NB/dt/1e6:.2f} M inst/s)")
    return dt


t_sigma = timeit("sigma_deltas (phase A)", lambda c: kernels._sigma_deltas_lanes(c, interpret=False), cov_t)
t_pred = timeit("predict_lanes", lambda l: pf.predict_lanes(l, params, 0.01), ls)
t_upd = timeit("update_velocity_lanes", lambda l: puf.update_velocity_lanes(l, params, z, r, None)[0], ls)

def two(l):
    l = pf.predict_lanes(l, params, 0.01)
    l, _ = puf.update_velocity_lanes(l, params, z, r, None)
    return l
t_step = timeit("2-launch step", two, ls)
print(f"\npredict w/o phase A ~ {1e3*(t_pred-t_sigma):.3f} ms; update w/o A ~ {1e3*(t_upd-t_sigma):.3f} ms")
