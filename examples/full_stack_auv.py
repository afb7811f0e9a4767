"""Full four-filter AUV estimation stack — every reference filter, together.

The reference library's filters are deployed as a cooperating stack on a real
vehicle (the ROCK component pattern, SURVEY.md §3.6). This example runs all
four on one synthetic dive:

* **VelocityUKF** — high-rate body velocity from thruster efforts + gyro,
  corrected by DVL and pressure (its process model IS the Fossen dynamics);
* **BottomUKF**   — seafloor distance + surface normal from the four slanted
  DVL beam ranges, fed the VelocityUKF's velocity estimate as input;
* **PoseUKF**     — the flagship 53-DOF model-aided inertial localization
  fusing IMU, DVL, pressure and body efforts;
* **IndirectPoseUKF** — error-state corrector estimating the drift between
  the PoseUKF pose and sporadic visual-marker fixes, producing the final
  corrected pose.

Run:  JAX_PLATFORMS=cpu python examples/full_stack_auv.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(seconds=30.0, rate=50.0, seed=0):
    import jax
    import jax.numpy as jnp

    from slam_uwv_kalman_filters_tpu.models import (
        bottom_ukf as bukf,
        indirect_pose_ukf as iukf,
        pose_ukf as pukf,
        velocity_ukf as vukf,
    )
    from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn, manifolds as mf
    from slam_uwv_kalman_filters_tpu.utils.config import (
        CameraConfiguration,
        default_pose_ukf_config,
    )

    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    rng = np.random.default_rng(seed)
    dt = 1.0 / rate
    n = int(seconds * rate)

    # ---- ground truth: constant surge at depth over a sloping seafloor ----
    surge_effort = np.array([65.0, 0, 0, 0, 0, 0.0])  # ⇒ steady v_x = 1 m/s
    true_depth = -15.0
    seafloor_normal = np.array([0.05, 0.0, 1.0])
    seafloor_normal /= np.linalg.norm(seafloor_normal)
    seafloor_d0 = 8.0  # distance below the vehicle at t=0

    model = dyn.default_uwv_parameters(dtype=dtype)
    cfg = default_pose_ukf_config()

    # ---- the four filters -------------------------------------------------
    vel_state, vel_params = vukf.init(
        vukf.VelocityState(
            velocity=jnp.zeros(3, dtype), z_position=jnp.asarray([true_depth], dtype)
        ),
        jnp.eye(4, dtype=dtype) * 0.1,
        model,
    )

    bot_state, bot_params = bukf.init(
        bukf.BottomState(
            distance=jnp.asarray([seafloor_d0 + 1.0], dtype),
            normal=jnp.asarray([0.0, 0.0, 1.0], dtype),
        ),
        jnp.diag(jnp.asarray([4.0, 0.05, 0.05], dtype)),
    )

    pose_state, pose_params = pukf.init_from_pose(
        imu_in_nwu_pos=jnp.asarray([0.0, 0.0, true_depth], dtype),
        imu_in_nwu_pos_cov=jnp.eye(3, dtype=dtype) * 0.25,
        imu_in_nwu_rot=jnp.asarray([1.0, 0, 0, 0], dtype),
        imu_in_nwu_rot_cov=jnp.eye(3, dtype=dtype) * 1e-4,
        config=cfg,
        model_parameters=model,
        imu_delta_t=dt,
        dtype=dtype,
    )

    ind_state, ind_params = iukf.init(
        position_error_std=jnp.full(3, 1e-3, dtype),
        orientation_error_std=jnp.full(3, 1e-4, dtype),
        orientation_error_tau=60.0,
        dtype=dtype,
    )

    # ---- jitted per-tick pipelines ---------------------------------------
    r_dvl = jnp.eye(3, dtype=dtype) * 1e-4
    r_press_v = jnp.eye(1, dtype=dtype) * 1e-3
    r_press_p = jnp.eye(1, dtype=dtype) * 2500.0
    r_range = jnp.eye(1, dtype=dtype) * 1e-2
    beam_dirs = jnp.asarray(  # 4 Janus beams, 30° from vertical, pointing down
        [
            [np.sin(np.pi / 6), 0, -np.cos(np.pi / 6)],
            [-np.sin(np.pi / 6), 0, -np.cos(np.pi / 6)],
            [0, np.sin(np.pi / 6), -np.cos(np.pi / 6)],
            [0, -np.sin(np.pi / 6), -np.cos(np.pi / 6)],
        ],
        dtype,
    )

    @jax.jit
    def velocity_tick(vs, gyro, efforts, dvl, depth, do_dvl):
        vs = vukf.integrate_gyro(vs, gyro)
        vs = vukf.integrate_body_efforts(vs, efforts)
        vs = vukf.predict(vs, vel_params, dt)
        vs2, _ = vukf.update_dvl(vs, dvl, r_dvl)
        vs = jax.tree_util.tree_map(lambda a, b: jnp.where(do_dvl, a, b), vs2, vs)
        vs, _ = vukf.update_pressure(vs, depth, r_press_v)
        return vs

    @jax.jit
    def bottom_tick(bs, velocity, ranges, do_ranges):
        bs = bukf.set_velocity(bs, velocity)
        bs = bukf.predict(bs, bot_params, dt)

        def apply_ranges(bs):
            for k in range(4):
                bs, _ = bukf.update_range(bs, ranges[k : k + 1], r_range, beam_dirs[k], jnp.zeros(3, dtype))
            return bs

        bs2 = apply_ranges(bs)
        return jax.tree_util.tree_map(lambda a, b: jnp.where(do_ranges, a, b), bs2, bs)

    # visual-marker geometry for the IndirectPoseUKF: a down-looking camera
    # (180° about body x: camera z points down) sights a 0.5 m seafloor
    # marker every few seconds; pixels are synthesized from the TRUE pose so
    # the error-state filter must recover the PoseUKF's drift
    cam = CameraConfiguration()
    cam_q = jnp.asarray([0.0, 1.0, 0.0, 0.0], dtype)
    cam_p = jnp.zeros(3, dtype)
    marker_q = jnp.asarray([1.0, 0, 0, 0], dtype)
    feature_pos = jnp.asarray(
        [[0.25, 0.25, 0.0], [-0.25, 0.25, 0.0], [-0.25, -0.25, 0.0], [0.25, -0.25, 0.0]],
        dtype,
    )
    marker_period = int(5.0 * rate)

    def project_marker(true_q, true_p, marker_p):
        """True-pose pinhole projection of the marker corners (simulation side)."""
        cam_nav_q, cam_nav_p = mf.affine_mul(true_q, true_p, cam_q, cam_p)
        nav_cam_q, nav_cam_p = mf.affine_inv(cam_nav_q, cam_nav_p)
        pixels = []
        for i in range(feature_pos.shape[0]):
            f_nav = mf.affine_apply(marker_q, marker_p, feature_pos[i])
            f_cam = np.asarray(mf.affine_apply(nav_cam_q, nav_cam_p, f_nav))
            pixels.append([f_cam[0] / f_cam[2] * cam.fx + cam.cx,
                           f_cam[1] / f_cam[2] * cam.fy + cam.cy])
        return np.asarray(pixels)

    @jax.jit
    def pose_tick(ps, gyro, acc, dvl, pressure, efforts, do_dvl):
        ps = pukf.integrate_rotation_rate(ps, gyro)
        ps = pukf.predict(ps, pose_params, dt)
        ps, _ = pukf.update_acceleration(ps, pose_params, acc, jnp.eye(3, dtype=dtype) * 1e-4)
        ps2, _ = pukf.update_velocity(ps, pose_params, dvl, r_dvl)
        ps = jax.tree_util.tree_map(lambda a, b: jnp.where(do_dvl, a, b), ps2, ps)
        ps, _ = pukf.update_pressure(ps, pose_params, pressure, r_press_p)
        ps, _ = pukf.update_body_efforts(ps, pose_params, efforts, jnp.eye(6, dtype=dtype) * 1e-1)
        return ps

    # ---- replay -----------------------------------------------------------
    g = 9.8209
    rho = float(cfg.hydrostatics.water_density)
    p_atm = float(cfg.hydrostatics.atmospheric_pressure)
    t0 = time.perf_counter()
    v_true = 0.0
    pos_x = 0.0
    for k in range(n):
        # simple surge dynamics ground truth: m·v̇ = τ − d_l·v − d_q·v²
        v_true += dt * (65.0 - 40.0 * v_true - 25.0 * v_true**2) / 145.4
        pos_x += dt * v_true
        dist_true = seafloor_d0 - pos_x * seafloor_normal[0] / seafloor_normal[2]

        gyro = jnp.asarray(rng.normal(scale=1e-4, size=3), dtype)
        acc = jnp.asarray([0, 0, g] + rng.normal(scale=1e-3, size=3), dtype)
        dvl = jnp.asarray([v_true, 0, 0] + rng.normal(scale=2e-3, size=3), dtype)
        depth_meas = jnp.asarray([true_depth + rng.normal(scale=0.02)], dtype)
        pressure = jnp.asarray([p_atm - true_depth * g * rho + rng.normal(scale=50.0)], dtype)
        efforts = jnp.asarray(surge_effort + rng.normal(scale=0.5, size=6), dtype)
        # per-beam ranges: ray/plane intersection r = d / (−beam·n)
        denom = -(np.asarray(beam_dirs) @ seafloor_normal)
        ranges = jnp.asarray(dist_true / denom + rng.normal(scale=0.05, size=4), dtype)

        do_dvl = jnp.asarray(k % 10 == 0)
        vel_state = velocity_tick(vel_state, gyro, efforts, dvl, depth_meas, do_dvl)
        bot_state = bottom_tick(
            bot_state, mf.quat_rotate(pose_state.mu.orientation, vel_state.mu.velocity), ranges, do_dvl
        )
        pose_state = pose_tick(pose_state, gyro, acc, dvl, pressure, efforts, do_dvl)

        # IndirectPoseUKF: sporadic visual-marker fix against the PoseUKF pose
        if (k + 1) % marker_period == 0:
            true_q = jnp.asarray([1.0, 0, 0, 0], dtype)  # yaw-free ground truth
            true_p = jnp.asarray([pos_x, 0.0, true_depth], dtype)
            marker_p = jnp.asarray([pos_x, 0.0, true_depth - 6.0], dtype)
            pixels = project_marker(true_q, true_p, marker_p)
            pixels += rng.normal(scale=0.5, size=pixels.shape)
            ind_state = iukf.predict(ind_state, ind_params, 5.0)
            ind_state = iukf.update_pose_reference(
                ind_state, pose_state.mu.position, pose_state.mu.orientation
            )
            ind_state, _ = iukf.update_markers(
                ind_state,
                jnp.asarray(pixels, dtype),
                jnp.tile(jnp.eye(2, dtype=dtype)[None] * 0.25, (4, 1, 1)),
                feature_pos,
                marker_p,
                marker_q,
                jnp.eye(6, dtype=dtype) * 1e-6,
                cam,
                cam_p,
                cam_q,
            )

    wall = time.perf_counter() - t0

    # ---- report -----------------------------------------------------------
    v_est = float(vel_state.mu.velocity[0])
    z_est = float(vel_state.mu.z_position[0])
    d_est = float(bot_state.mu.distance[0])
    nrm = np.asarray(bot_state.mu.normal)
    pose_v = np.asarray(pose_state.mu.velocity)
    pose_p = np.asarray(pose_state.mu.position)
    _, corr_p = iukf.corrected_pose(ind_state)  # returns (orientation, position)

    print(f"replayed {n} ticks x 4 filters in {wall:.1f}s")
    print(f"VelocityUKF: v_x={v_est:.3f} (true {v_true:.3f})  depth={z_est:.2f} (true {true_depth})")
    print(f"BottomUKF:   distance={d_est:.2f} (true {dist_true:.2f})  "
          f"normal=({nrm[0]:.3f},{nrm[1]:.3f},{nrm[2]:.3f}) (true ({seafloor_normal[0]:.3f},0,{seafloor_normal[2]:.3f}))")
    print(f"PoseUKF:     |v|err={abs(pose_v[0]-v_true):.3f}  pos_x={pose_p[0]:.2f} (true {pos_x:.2f})")
    print(f"IndirectPoseUKF corrected pose x={float(corr_p[0]):.2f} "
          f"(raw PoseUKF err {abs(pose_p[0] - pos_x):.3f} m -> "
          f"corrected err {abs(float(corr_p[0]) - pos_x):.3f} m)")

    assert abs(v_est - v_true) < 0.02, "VelocityUKF diverged"
    assert abs(d_est - dist_true) < 0.3, "BottomUKF distance diverged"
    assert abs(nrm[0] - seafloor_normal[0]) < 0.03, "BottomUKF normal not recovered"
    assert abs(pose_p[0] - pos_x) < 0.5, "PoseUKF position diverged"
    assert abs(float(corr_p[0]) - pos_x) < 0.15, "IndirectPoseUKF correction diverged"
    print("FULL STACK OK")
    return wall


if __name__ == "__main__":
    main()
