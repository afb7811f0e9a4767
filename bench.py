"""Benchmark harness — PoseUKF predict+update throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric (BASELINE.md): batched PoseUKF predict+update steps/sec/chip.
One "step" = one 53-DOF unscented prediction (107 sigma points through the
full process model incl. earth-rate attitude propagation) + one DVL velocity
update, per filter instance.

Baseline: the reference publishes no numbers (BASELINE.md), so the stand-in
for "C++ single-core filter-updates/sec" is the same step jit-compiled by
XLA-CPU for a single f64 instance — Eigen-class scalar code on one core,
which is what the reference's ukfom/MTK stack compiles to. ``vs_baseline`` is
the speedup of the batched TPU path over that single-instance CPU rate (the
north-star target is ≥100×).

Environment knobs: BENCH_BANK (default 65536 — measured ~4.5% over 32k and
within ~1% of 131k, whose extra compile-time variability isn't worth it for
an unattended timed run), BENCH_ITERS (default 30), BENCH_DTYPE (float32 on
TPU — f64 does not compile on this backend).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _log(*a):
    print(*a, file=sys.stderr)


def build_step(dtype, scenario: str = "pose"):
    if scenario == "pose":
        return _build_pose_step(dtype)
    if scenario == "velocity":
        return _build_velocity_step(dtype)
    if scenario == "bottom":
        return _build_bottom_step(dtype)
    if scenario == "indirect":
        return _build_indirect_step(dtype)
    raise ValueError(f"unknown BENCH_SCENARIO {scenario!r}")


def _build_velocity_step(dtype):
    """BASELINE configs[0]: VelocityUKF with thruster efforts + DVL."""
    import jax.numpy as jnp

    from slam_uwv_kalman_filters_tpu.models import velocity_ukf as vukf
    from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn

    mu = vukf.VelocityState(velocity=jnp.zeros(3, dtype), z_position=jnp.zeros(1, dtype))
    state, params = vukf.init(mu, jnp.eye(4, dtype=dtype) * 0.1, dyn.default_uwv_parameters(dtype))
    state = vukf.integrate_body_efforts(state, jnp.array([60.0, 0, 0, 0, 0, 1.0], dtype))

    def step(s, z, r):
        s = vukf.predict(s, params, 0.05)
        s, _ = vukf.update_dvl(s, z, r)
        return s

    def bank_step(bs, z, r):
        # fused Pallas path on TPU f32 (models/velocity_fused.py)
        bs = vukf.predict_bank(bs, params, 0.05)
        bs, _ = vukf.update_dvl_bank(bs, z, r)
        return bs

    step.bank_step = bank_step

    from slam_uwv_kalman_filters_tpu.models import velocity_fused as vfu

    def lanes_step(ls, z, r):
        # the whole predict+DVL step in ONE kernel launch — the 4-DOF filter
        # is far too small to amortize separate launches
        ls, _ = vfu.step_lanes(ls, params, 0.05, [vfu.StepUpdate("dvl", z, r)])
        return ls

    step.lanes = (vfu.to_lanes, lanes_step)
    return state, params, step


def _build_bottom_step(dtype):
    """BASELINE configs[1]: BottomUKF DVL bottom-range tracking."""
    import jax.numpy as jnp

    from slam_uwv_kalman_filters_tpu.models import bottom_ukf as bukf

    mu = bukf.BottomState(distance=jnp.array([10.0], dtype), normal=jnp.array([0.0, 0.0, 1.0], dtype))
    state, params = bukf.init(mu, jnp.diag(jnp.array([1.0, 0.05, 0.05], dtype)))
    state = bukf.set_velocity(state, jnp.array([0.5, 0.0, -0.1], dtype))
    beam = jnp.array([0.0, 0.0, -1.0], dtype)
    origin = jnp.zeros(3, dtype)

    def step(s, z, r):
        s = bukf.predict(s, params, 0.1)
        s, _ = bukf.update_range(s, z[:1], r[:1, :1], beam, origin)
        return s

    def bank_step(bs, z, r):
        # fused Pallas path on TPU f32 (models/bottom_fused.py)
        bs = bukf.predict_bank(bs, params, 0.1)
        bs, _ = bukf.update_range_bank(bs, z[:, :1], r[:, :1, :1], beam, origin)
        return bs

    step.bank_step = bank_step

    from slam_uwv_kalman_filters_tpu.models import bottom_fused as bfu

    def lanes_step(ls, z, r):
        # whole predict+range step in ONE launch (incl. the S² Karcher mean)
        ls, _ = bfu.step_lanes(
            ls, params, 0.1, [bfu.StepUpdate("range", z[:, :1], r[:, :1, :1], beam, origin)]
        )
        return ls

    step.lanes = (bfu.to_lanes, lanes_step)
    return state, params, step


def _build_indirect_step(dtype):
    """BASELINE configs[2]: IndirectPoseUKF error-state filter — one
    prediction plus a one-corner visual-marker update (state augmentation +
    S² measurement + marginalization) per step."""
    import jax.numpy as jnp

    from slam_uwv_kalman_filters_tpu.models import indirect_pose_ukf as ipu
    from slam_uwv_kalman_filters_tpu.utils.config import CameraConfiguration

    state, params = ipu.init((0.05,) * 3, (0.02,) * 3, 30.0, dtype=dtype)
    cam = CameraConfiguration()
    feature_px = jnp.array([[330.0, 236.0]], dtype)
    feature_cov = jnp.eye(2, dtype=dtype)[None] * 4.0
    feature_pos = jnp.array([[0.1, 0.1, 0.0]], dtype)
    marker_pos = jnp.array([2.0, 0.0, 1.0], dtype)
    marker_rot = jnp.array([1.0, 0, 0, 0], dtype)
    cov_marker = jnp.eye(6, dtype=dtype) * 1e-4
    cam_in_body_pos = jnp.zeros(3, dtype)
    cam_in_body_rot = jnp.array([1.0, 0, 0, 0], dtype)

    def step(s, z, r):
        s = ipu.predict(s, params, 0.1)
        s, _ = ipu.update_markers(
            s, feature_px, feature_cov, feature_pos, marker_pos, marker_rot,
            cov_marker, cam, cam_in_body_pos, cam_in_body_rot,
        )
        return s

    def bank_step(bs, z, r):
        # fused Pallas path on TPU f32 (models/indirect_fused.py): the 12-DOF
        # marker augmentation lives only in VMEM
        bs = ipu.predict_bank(bs, params, 0.1)
        bs, _ = ipu.update_markers_bank(
            bs, feature_px, feature_cov, feature_pos, marker_pos, marker_rot,
            cov_marker, cam, cam_in_body_pos, cam_in_body_rot,
        )
        return bs

    step.bank_step = bank_step

    from slam_uwv_kalman_filters_tpu.models import indirect_fused as ifu

    def lanes_step(ls, z, r):
        ls = ifu.predict_lanes(ls, params, 0.1)
        ls, _ = ifu.update_markers_lanes(
            ls, feature_px, feature_cov, feature_pos, marker_pos, marker_rot,
            cov_marker, cam, cam_in_body_pos, cam_in_body_rot,
        )
        return ls

    step.lanes = (ifu.to_lanes, lanes_step)
    return state, params, step


def _build_pose_step(dtype):
    from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
    from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn
    from slam_uwv_kalman_filters_tpu.utils.config import default_pose_ukf_config

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

    def step(s, z, r):
        s = pukf.predict(s, params, 0.01)
        s, _ = pukf.update_velocity(s, params, z, r)
        return s

    def bank_step(bs, z, r):
        # fused Pallas predict + update on the TPU f32 path (models/pose_fused.py,
        # models/pose_update_fused.py); generic vmap path elsewhere
        bs = pukf.predict_bank(bs, params, 0.01)
        bs, _ = pukf.update_velocity_bank(bs, params, z, r)
        return bs

    step.bank_step = bank_step

    # Lanes-persistent loop (the production steady-state pattern,
    # docs/DEPLOYMENT.md): the bank stays in kernel layout between steps, so
    # the per-step layout conversions and the lower-triangle mirror are paid
    # once outside the loop instead of every step — measured 1.23x over the
    # public bank chain at 32k instances, bit-identical results.
    from slam_uwv_kalman_filters_tpu.models import pose_fused as pf
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf

    def lanes_step(ls, z, r):
        # DVL measurement model fused in-kernel: the sigma-delta tensor never
        # round-trips HBM (models/pose_update_fused.update_velocity_lanes).
        # The single-launch whole step (puf.step_velocity_lanes) measures
        # ~1% SLOWER at this bank size — its ~23 MB VMEM working set cuts
        # into pipelining headroom — but halves launch count for
        # latency-sensitive small-bank online loops.
        ls = pf.predict_lanes(ls, params, 0.01)
        ls, _ = puf.update_velocity_lanes(ls, params, z, r, None)
        return ls

    step.lanes = (pf.to_lanes, lanes_step)
    return state, params, step


def bench_tpu_bank(state, step, bank_n, iters, dtype):
    from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod

    bstate = bankmod.replicate(state, bank_n)
    z = jnp.tile(jnp.array([0.3, 0.0, 0.0], dtype)[None], (bank_n, 1))
    r = jnp.tile((jnp.eye(3, dtype=dtype) * 1e-3)[None], (bank_n, 1, 1))

    lanes = getattr(step, "lanes", None)
    if (
        lanes is not None
        and jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
    ):
        to_lanes, lanes_step = lanes
        jstep = jax.jit(lambda ls: lanes_step(ls, z, r))
        ls = jax.block_until_ready(to_lanes(bstate))
        ls = jax.block_until_ready(jstep(ls))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            ls = jstep(ls)
        jax.block_until_ready(ls.cov_t)
        dt = time.perf_counter() - t0
        return bank_n * iters / dt

    banked = getattr(step, "bank_step", None)

    @jax.jit
    def bank_step(bs):
        if banked is not None:
            return banked(bs, z, r)
        return jax.vmap(step)(bs, z, r)

    bstate = jax.block_until_ready(bank_step(bstate))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        bstate = bank_step(bstate)
    jax.block_until_ready(bstate)
    dt = time.perf_counter() - t0
    return bank_n * iters / dt


def bench_cpu_single(scenario="pose", iters=300):
    """Single-instance rate on one CPU core — the C++-semantics stand-in
    (XLA-CPU scalar code ≈ Eigen codegen). Enables x64 so the f64 request is
    honored (without it jnp silently truncates to f32, which would mislabel
    the baseline); safe here because this runs AFTER the timed TPU/f32
    measurement and config flips only affect subsequent traces."""
    jax.config.update("jax_enable_x64", True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state, params, step = build_step(jnp.float64, scenario)
        z = jnp.array([0.3, 0.0, 0.0], jnp.float64)
        r = jnp.eye(3, dtype=jnp.float64) * 1e-3
        jstep = jax.jit(step)
        # warm thoroughly, then take the best of 5 timed passes — the host is
        # shared, so single-pass timings swing several-fold
        for _ in range(20):
            state = jstep(state, z, r)
        jax.block_until_ready(state)
        best = 0.0
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                state = jstep(state, z, r)
            jax.block_until_ready(state)
            best = max(best, iters / (time.perf_counter() - t0))
        return best


def main():
    # persistent compile cache: the fused kernels take ~1-2 min of (remote)
    # compile per shape on first use; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    bank_n = int(os.environ.get("BENCH_BANK", "65536"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    scenario = os.environ.get("BENCH_SCENARIO", "pose")
    backend = jax.default_backend()
    # f64 is CPU-only on this stack; TPU runs the f32 throughput path.
    dtype = jnp.float64 if backend == "cpu" else jnp.float32
    dtype = {"float32": jnp.float32, "float64": jnp.float64}.get(
        os.environ.get("BENCH_DTYPE", ""), dtype
    )
    if jnp.dtype(dtype) == np.float64:
        # without x64 a float64 request silently truncates to f32 and the
        # logged dtype would be a lie
        jax.config.update("jax_enable_x64", True)

    _log(
        f"backend={backend} scenario={scenario} bank={bank_n} iters={iters} "
        f"dtype={jnp.dtype(dtype).name}"
    )
    state, params, step = build_step(dtype, scenario)

    t0 = time.perf_counter()
    value = bench_tpu_bank(state, step, bank_n, iters, dtype)
    _log(f"batched: {value:.0f} steps/s (wall {time.perf_counter()-t0:.1f}s)")

    try:
        baseline = bench_cpu_single(scenario)
        _log(f"single-instance CPU baseline: {baseline:.0f} steps/s")
        vs_baseline = value / baseline
    except Exception as e:  # CPU backend unavailable — report raw throughput
        _log(f"baseline measurement failed: {e}")
        vs_baseline = float("nan")

    print(
        json.dumps(
            {
                "metric": f"{scenario}_ukf_predict_update_steps_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "filter-steps/s",
                "vs_baseline": round(vs_baseline, 2) if np.isfinite(vs_baseline) else None,
            }
        )
    )


if __name__ == "__main__":
    main()
