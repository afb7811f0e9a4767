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
ls0 = jax.block_until_ready(pf.to_lanes(bstate))
z = jnp.tile(jnp.array([0.3, 0.0, 0.0], dtype)[None], (NB, 1))
r = jnp.tile((jnp.eye(3, dtype=dtype) * 1e-3)[None], (NB, 1, 1))

def two(l):
    l = pf.predict_lanes(l, params, 0.01)
    return puf.update_velocity_lanes(l, params, z, r, None)[0]
jfn = jax.jit(two)
ls = jfn(ls0)
_ = float(jax.device_get(ls.cov_t[0, 0, 0]))

for iters in (10, 30):
    ls = jfn(ls0)
    _ = float(jax.device_get(ls.cov_t[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        ls = jfn(ls)
    v = float(jax.device_get(ls.cov_t[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"2-launch step, device_get sync, iters={iters}: {dt*1e3:.3f} ms  ({NB/dt/1e6:.2f} M steps/s, probe={v:.3e})")

# block_until_ready variant (bench.py's method)
ls = jfn(ls0)
jax.block_until_ready(ls.cov_t)
t0 = time.perf_counter()
for _ in range(30):
    ls = jfn(ls)
jax.block_until_ready(ls.cov_t)
dt = (time.perf_counter() - t0) / 30
print(f"2-launch step, block_until_ready, iters=30: {dt*1e3:.3f} ms  ({NB/dt/1e6:.2f} M steps/s)")
