"""Benchmark harness — PoseUKF mission-tick throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "ate_m": ..., ...}

Default metric (BASELINE.md configs[3] + north star): **full-mission
PoseUKF ticks/sec/chip at the 100k-class bank**. One "tick" is the ICRA'18
steady-state second divided by 100: every tick runs the 53-DOF unscented
prediction (107 sigma points through the full process model incl. earth-rate
attitude propagation) and the IMU acceleration update, and the multi-rate
aiding sensors fire on their reference schedule — DVL 5 Hz, pressure 2 Hz,
ADCP 1 Hz, body-effort (model aiding) 10 Hz. The schedule is compiled
statically (each tick pays exactly the updates it schedules, like the
reference's event-driven host), not masked.

``ate_m`` closes the accuracy loop in the same artifact: a 1-minute ICRA'18
mission replay at the dtype that actually runs on the chip (f32), reported as
ATE RMSE in metres against simulated ground truth (north-star bound: 0.10 m).

Baseline: the reference publishes no numbers (BASELINE.md), so the stand-in
for "C++ single-core filter-updates/sec" is the same tick jit-compiled by
XLA-CPU for a single f64 instance — Eigen-class scalar code on one core,
which is what the reference's ukfom/MTK stack compiles to. ``vs_baseline``
divides by the **canonical committed baseline** (BASELINE_CPU.json, median of
long runs on an idle core) so round-over-round movement reflects the TPU
number, not shared-host noise; a live re-measurement is logged to stderr as a
sanity check only.

Environment knobs: BENCH_SCENARIO (pose_full | pose | velocity | bottom |
indirect), BENCH_BANK (default 131072 for pose_full — the north star names
100k instances; 65536 for the single-sensor scenarios), BENCH_ITERS,
BENCH_INNER (in-program fori_loop length amortizing per-dispatch tunnel RTT
for the small-filter scenarios), BENCH_DTYPE (float32 on TPU — f64 does not
compile on this backend), BENCH_POSE_PATH (lanes | steps | bank),
BENCH_ATE=0 to skip the solo accuracy replay, BENCH_BANK_ATE (fleet ATE
distribution bank size; default 1024 on TPU, off on CPU), BENCH_SURFACE=0 /
BENCH_SMALL=0 / BENCH_LATENCY=0 to skip the extra artifact scenarios
(BENCH_SMALL defaults off on CPU), BENCH_CHECK_BASELINE=0 to skip the live
CPU-baseline sanity check, BENCH_DEADLINE (seconds, default 780) — the
internal wall-clock budget: the headline phase runs first, every optional
phase checks the remaining budget before starting, and a SIGALRM safety net
prints the partial artifact if the budget is overrun anyway.
"""

from __future__ import annotations

import functools
import json
import os
import signal
import sys
import time

import threading

import jax
import jax.numpy as jnp
import numpy as np


def _log(*a):
    print(*a, file=sys.stderr)


# ---------------------------------------------------------------------------
# wall-clock budget: the driver runs this under a hard timeout, and a bench
# that dies mid-phase leaves NO artifact (round-4 lesson: rc=124, parsed
# null). Every optional phase checks the remaining budget before starting,
# and a watchdog THREAD prints whatever has been accumulated and exits 0 if
# a phase overstays anyway. A thread, not (only) SIGALRM: a hung remote
# compile/transfer RPC parks the main thread in a C-level futex wait where
# Python never gets back between bytecodes to run a signal handler, but a
# daemon timer thread still runs because the blocked call releases the GIL
# (observed live on the axon backend during round-5 validation).
# ---------------------------------------------------------------------------

_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE", "780"))
_OUT: dict = {}  # the one-line artifact, filled in as phases complete
_PHASE = ["startup"]  # name of the phase in progress, for truncation reports


def _remaining() -> float:
    return _DEADLINE_S - (time.monotonic() - _T0)


_EMIT_ONCE = threading.Lock()


def _emit_and_exit(signum=None, frame=None):
    # exactly ONE json line, whichever of {main thread, watchdog, SIGALRM}
    # gets here first — the loser parks until the winner's os._exit
    if not _EMIT_ONCE.acquire(blocking=False):
        while True:
            time.sleep(60.0)
    if signum is not None:
        # say WHICH phase was cut short — a bench truncated in the optional
        # tail (e.g. the advisory live-baseline re-measurement) still
        # carries every measured number
        _OUT.setdefault("truncated_phase", _PHASE[0])
        _log(
            f"BENCH_DEADLINE ({_DEADLINE_S:.0f}s) hit during {_PHASE[0]!r} — "
            "emitting partial artifact"
        )
    print(json.dumps(_OUT), flush=True)
    os._exit(0)


def _arm_watchdog() -> threading.Timer:
    t = threading.Timer(_DEADLINE_S + 30.0, _emit_and_exit, args=(signal.SIGALRM, None))
    t.daemon = True
    t.start()
    return t


def _phase_budget_ok(name: str, est_s: float) -> bool:
    if _remaining() > est_s + 45.0:
        _PHASE[0] = name
        return True
    _log(f"skipping {name}: est {est_s:.0f}s > remaining {_remaining():.0f}s budget")
    return False


def _make_sync(example):
    """True device synchronization for timing loops.

    On the axon remote-TPU backend ``jax.block_until_ready`` returns
    immediately (measured: a 768 MB triad "completes" in 0.12 ms under it,
    while a forced host readback shows the real cost), so every timed region
    must end with a host readback. This builds a tiny jitted probe (one
    element of the array, so the transfer is 4 bytes) compiled once outside
    the timed region; calling the returned function blocks until every
    enqueued execution the probed array depends on has actually run."""
    probe = jax.jit(lambda a: a.reshape(-1)[0])
    probe(example).item()  # compile + warm outside any timed region
    return lambda a: probe(a).item()


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


# ---------------------------------------------------------------------------
# pose_full: the ICRA'18 steady-state mission second (BASELINE configs[3])
# ---------------------------------------------------------------------------

# one second of the reference's event schedule at 100 Hz IMU: tick k runs
# predict + acceleration always, plus whichever aiding sensors fire at k
FULL_TICKS = 100
_DVL_AT = lambda k: k % 20 == 19  # 5 Hz
_PRESS_AT = lambda k: k % 50 == 49  # 2 Hz
_ADCP_AT = lambda k: k % 100 == 99  # 1 Hz
_EFF_AT = lambda k: k % 10 == 9  # 10 Hz


def _pose_full_setup(dtype, host_only=False):
    from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
    from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn, geodesy as geo
    from slam_uwv_kalman_filters_tpu.utils.config import default_pose_ukf_config

    # build the small initial pytrees on the LOCAL CPU backend and move them
    # over in one device_put: init_from_pose is hundreds of tiny eager ops,
    # and on the remote-tunnel TPU backend each pays dispatch RTT — measured
    # ~3 min of the r3/r4 batched-phase wall was this setup, ~20 s this way
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        cfg = default_pose_ukf_config()
        state, params = pukf.init_from_pose(
            imu_in_nwu_pos=jnp.zeros(3, dtype),
            imu_in_nwu_pos_cov=jnp.eye(3, dtype=dtype) * 0.01,
            imu_in_nwu_rot=jnp.array([1.0, 0, 0, 0], dtype),
            imu_in_nwu_rot_cov=jnp.eye(3, dtype=dtype) * 1e-4,
            config=cfg,
            model_parameters=dyn.default_uwv_parameters(dtype=dtype),
            imu_delta_t=0.01,
            dtype=dtype,
        )
        g = float(geo.wgs84_gravity(cfg.location.latitude, cfg.location.altitude))
        meas = dict(
            gyro=jnp.asarray([0.0, 0.0, 0.01], dtype),
            acc=jnp.asarray([0.0, 0.0, g], dtype),
            acc_cov=jnp.eye(3, dtype=dtype) * 4e-5,
            dvl=jnp.asarray([0.3, 0.0, 0.0], dtype),
            dvl_cov=jnp.eye(3, dtype=dtype) * 1e-3,
            press=jnp.asarray([float(cfg.hydrostatics.atmospheric_pressure)], dtype),
            press_cov=jnp.eye(1, dtype=dtype) * 2500.0,
            adcp=jnp.asarray([0.0, 0.0], dtype),
            adcp_cov=jnp.eye(2, dtype=dtype) * 1e-3,
            eff=jnp.zeros(6, dtype),
            eff_cov=jnp.eye(6, dtype=dtype) * 1.0,
        )
    # host_only: the caller wants the pytrees to STAY on the CPU backend
    # (the f64 live-baseline runs under jax.default_device(cpu), which
    # jax.default_backend() does not reflect — it reports backend priority)
    if not host_only and jax.default_backend() != "cpu":
        state, params, meas = jax.device_put(
            (state, params, meas), jax.devices()[0]
        )
    return state, params, meas


def bench_pose_full_tpu(bank_n, iters, dtype):
    """Batched full-mission second: the 100-tick schedule unrolled statically
    over the fused bank chain — each tick launches exactly the updates the
    reference's event-driven host would run, per-instance rotation rates feed
    the model-aided efforts update."""
    from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
    from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod

    state, params, ms = _pose_full_setup(dtype)
    bstate = bankmod.replicate(state, bank_n)
    bc = lambda a: jnp.broadcast_to(a, (bank_n, *a.shape))

    @jax.jit
    def super_tick(bs):
        bs = bs._replace(rotation_rate=bc(ms["gyro"]))
        for k in range(FULL_TICKS):
            bs = pukf.predict_bank(bs, params, 0.01)
            bs, _ = pukf.update_acceleration_bank(bs, params, bc(ms["acc"]), ms["acc_cov"])
            if _DVL_AT(k):
                bs, _ = pukf.update_velocity_bank(bs, params, bc(ms["dvl"]), ms["dvl_cov"])
            if _PRESS_AT(k):
                bs, _ = pukf.update_pressure_bank(bs, params, bc(ms["press"]), ms["press_cov"])
            if _ADCP_AT(k):
                bs, _ = pukf.update_water_velocity_bank(
                    bs, params, bc(ms["adcp"]), ms["adcp_cov"], 0.5
                )
            if _EFF_AT(k):
                rr = pukf.get_rotation_rate_bank(bs, params)
                bs, _ = pukf.update_body_efforts_bank(bs, params, bc(ms["eff"]), ms["eff_cov"], rr)
        return bs

    sync = _make_sync(bstate.cov)
    bstate = super_tick(bstate)  # compile + warm
    sync(bstate.cov)
    t0 = time.perf_counter()
    for _ in range(iters):
        bstate = super_tick(bstate)
    sync(bstate.cov)
    dt = time.perf_counter() - t0
    if not bool(jnp.isfinite(bstate.cov).all()):
        raise RuntimeError("pose_full bench diverged: non-finite covariance")
    return bank_n * FULL_TICKS * iters / dt


def bench_pose_full_tpu_lanes(bank_n, iters, dtype, steps=False):
    """Lanes-persistent full-mission second: identical schedule to
    :func:`bench_pose_full_tpu`, but the bank never leaves kernel layout
    between launches — the per-call (B,n,n)↔(n,n,B) transposes and the
    lower-triangle mirror of the public bank API are paid once outside the
    loop instead of ~200 times per second (docs/TUNING.md roofline: those
    layout copies are pure HBM traffic on a memory-bound kernel chain).
    ``steps=True`` additionally fuses each tick's predict + in-kernel update
    chain into a single ``step_lanes`` launch (the 10 Hz efforts stream keeps
    its own launch), halving launch count."""
    from slam_uwv_kalman_filters_tpu.models import pose_fused as pf
    from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf
    from slam_uwv_kalman_filters_tpu.ops import ukf as ukfops
    from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod

    state, params, ms = _pose_full_setup(dtype)
    bstate = bankmod.replicate(state, bank_n)
    bc = lambda a: jnp.broadcast_to(a, (bank_n, *a.shape))
    bstate = bstate._replace(rotation_rate=bc(ms["gyro"]))
    p_atm = params.atmospheric_pressure
    # free the bank-first copy before the loop: at the 131k north-star bank
    # the (B,53,53) covariance alone is ~1.5 GB, and the steady-state loop
    # only ever needs the kernel-layout state (from_lanes takes structure,
    # not values)
    ls = jax.block_until_ready(pf.to_lanes(bstate))
    like = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), bstate)
    del bstate, state

    # the schedule as a scan over ticks with per-tick event flags, NOT a
    # 100-tick unrolled trace: identical launch sequence at runtime
    # (`lax.cond` on a scalar pred executes only the taken branch on TPU),
    # but the compiled body is ONE tick — predict + acc + four cond'd
    # updates — instead of 218 inlined kernel calls. Measured r5: cuts the
    # cold compile of the mission second ~6x (the round-4 artifact died in
    # that compile under host contention) at identical hot throughput.
    # flags derived from the SAME predicates the steps path and the CPU
    # baseline use — one schedule definition, three consumers
    flags = tuple(
        jnp.asarray([p(k) for k in range(FULL_TICKS)])
        for p in (_DVL_AT, _PRESS_AT, _ADCP_AT, _EFF_AT)
    )

    def tick(ls, f):
        dvl, press, adcp, eff = f
        ls = pf.predict_lanes(ls, params, 0.01)
        ls, _ = puf.update_model_lanes("acceleration", ls, bc(ms["acc"]), ms["acc_cov"])
        ls = jax.lax.cond(
            dvl,
            lambda l: puf.update_velocity_lanes(l, params, bc(ms["dvl"]), ms["dvl_cov"])[0],
            lambda l: l,
            ls,
        )
        ls = jax.lax.cond(
            press,
            lambda l: puf.update_model_lanes(
                "pressure", l, bc(ms["press"]), ms["press_cov"],
                aux=(p_atm, 0.0, 0.0, 0.0),
            )[0],
            lambda l: l,
            ls,
        )
        ls = jax.lax.cond(
            adcp,
            lambda l: puf.update_model_lanes(
                "water_velocity", l, bc(ms["adcp"]), ms["adcp_cov"],
                ukfops.D2P95, aux=(0.5,),
            )[0],
            lambda l: l,
            ls,
        )
        ls = jax.lax.cond(
            eff,
            lambda l: puf.update_body_efforts_lanes(l, params, bc(ms["eff"]), ms["eff_cov"])[0],
            lambda l: l,
            ls,
        )
        return ls, None

    # donate the carry: the production steady-state pattern — XLA aliases the
    # input state buffers into the output, halving resident state
    @functools.partial(jax.jit, donate_argnums=0)
    def super_tick(ls):
        if steps:
            # whole-step fused kernel variant keeps the static-schedule
            # unrolled trace (each tick's update list is a static argument)
            for k in range(FULL_TICKS):
                ups = [puf.StepUpdate("acceleration", bc(ms["acc"]), ms["acc_cov"])]
                if _DVL_AT(k):
                    ups.append(puf.StepUpdate("velocity", bc(ms["dvl"]), ms["dvl_cov"]))
                if _PRESS_AT(k):
                    ups.append(
                        puf.StepUpdate(
                            "pressure", bc(ms["press"]), ms["press_cov"],
                            None, (p_atm, 0.0, 0.0, 0.0),
                        )
                    )
                if _ADCP_AT(k):
                    ups.append(
                        puf.StepUpdate(
                            "water_velocity", bc(ms["adcp"]), ms["adcp_cov"],
                            ukfops.D2P95, (0.5,),
                        )
                    )
                ls, _ = puf.step_lanes(ls, params, 0.01, ups)
                if _EFF_AT(k):
                    ls, _ = puf.update_body_efforts_lanes(
                        ls, params, bc(ms["eff"]), ms["eff_cov"]
                    )
            return ls
        ls, _ = jax.lax.scan(tick, ls, flags)
        return ls

    sync = _make_sync(ls.cov_t)
    ls = super_tick(ls)  # compile + warm
    sync(ls.cov_t)
    t0 = time.perf_counter()
    for _ in range(iters):
        ls = super_tick(ls)
    sync(ls.cov_t)
    dt = time.perf_counter() - t0
    out = pf.from_lanes(ls, like)
    if not bool(jnp.isfinite(out.cov).all()):
        raise RuntimeError("pose_full lanes bench diverged: non-finite covariance")
    return bank_n * FULL_TICKS * iters / dt


# surface-transit second (VERDICT r3 item 8): the EVENT-RATE streams in a
# throughput number — on the surface the vehicle runs gated GPS fixes with
# antenna lever arm (1 Hz), XY and depth fixes (2 Hz) and a delayed XY fix
# (1 Hz) alongside IMU/DVL; no markers, no submerged model aiding
_SURF_Z_AT = lambda k: k % 50 == 24  # 2 Hz depth
_SURF_XY_AT = lambda k: k % 50 == 49  # 2 Hz XY fix
_SURF_DEL_AT = lambda k: k == 49  # 1 Hz delayed-XY fix
_SURF_GPS_AT = lambda k: k == 99  # 1 Hz gated GPS fix


def bench_pose_surface_tpu_lanes(bank_n, iters, dtype):
    """Surface-transit mission second on the lanes-persistent loop: gives the
    gated GPS lanes path, the delayed-XY path and the XY/Z fixes perf
    coverage (they were correctness-tested only through r3)."""
    from slam_uwv_kalman_filters_tpu.models import pose_driver as drv
    from slam_uwv_kalman_filters_tpu.models import pose_fused as pf
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf
    from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod

    state, params, ms = _pose_full_setup(dtype)
    bstate = bankmod.replicate(state, bank_n)
    bc = lambda a: jnp.broadcast_to(a, (bank_n, *a.shape))
    bstate = bstate._replace(rotation_rate=bc(ms["gyro"]))
    ls = jax.block_until_ready(pf.to_lanes(bstate))
    del bstate, state

    lat0 = jnp.asarray(params.projection.lat0, dtype)
    lon0 = jnp.asarray(params.projection.lon0, dtype)
    gps_in_body = jnp.asarray([0.4, 0.0, -1.0], dtype)
    xy = jnp.zeros((bank_n, 2), dtype)
    xy_cov = jnp.eye(2, dtype=dtype) * 2.25
    z = jnp.zeros((bank_n, 1), dtype)
    z_cov = jnp.eye(1, dtype=dtype) * 1e-2

    flags = tuple(
        jnp.asarray([p(k) for k in range(FULL_TICKS)])
        for p in (_DVL_AT, _SURF_Z_AT, _SURF_XY_AT, _SURF_DEL_AT, _SURF_GPS_AT)
    )

    def tick(ls, f):
        dvl, zf, xyf, delf, gpsf = f
        ls = pf.predict_lanes(ls, params, 0.01)
        ls, _ = puf.update_model_lanes("acceleration", ls, bc(ms["acc"]), ms["acc_cov"])
        ls = jax.lax.cond(
            dvl,
            lambda l: puf.update_velocity_lanes(l, params, bc(ms["dvl"]), ms["dvl_cov"])[0],
            lambda l: l,
            ls,
        )
        ls = jax.lax.cond(
            zf, lambda l: puf.update_model_lanes("z_position", l, z, z_cov)[0],
            lambda l: l, ls,
        )
        ls = jax.lax.cond(
            xyf, lambda l: puf.update_model_lanes("xy_position", l, xy, xy_cov)[0],
            lambda l: l, ls,
        )
        ls = jax.lax.cond(
            delf,
            lambda l: drv.delayed_xy_update_lanes(l, xy, xy_cov, xy, nb=bank_n)[0],
            lambda l: l,
            ls,
        )
        ls = jax.lax.cond(
            gpsf,
            lambda l: drv.gps_update_lanes(
                l, params, lat0, lon0, xy_cov, gps_in_body, nb=bank_n
            )[0],
            lambda l: l,
            ls,
        )
        return ls, None

    @functools.partial(jax.jit, donate_argnums=0)
    def super_tick(ls):
        ls, _ = jax.lax.scan(tick, ls, flags)
        return ls

    sync = _make_sync(ls.cov_t)
    ls = super_tick(ls)  # compile + warm
    sync(ls.cov_t)
    t0 = time.perf_counter()
    for _ in range(iters):
        ls = super_tick(ls)
    sync(ls.cov_t)
    dt = time.perf_counter() - t0
    if not bool(jnp.isfinite(ls.mu_t).all()):
        raise RuntimeError("pose_surface bench diverged: non-finite mean")
    return bank_n * FULL_TICKS * iters / dt


def bench_pose_full_cpu_single(iters=3, repeats=3):
    """Single-instance f64 full-mission second on one CPU core (the
    C++-semantics stand-in): separate jitted phases, applied only on their
    schedule — the reference's event-driven cost structure."""
    jax.config.update("jax_enable_x64", True)
    from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state, params, ms = _pose_full_setup(jnp.float64, host_only=True)
        state = pukf.integrate_rotation_rate(state, ms["gyro"])
        predict = jax.jit(lambda s: pukf.predict(s, params, 0.01))
        up_acc = jax.jit(lambda s: pukf.update_acceleration(s, params, ms["acc"], ms["acc_cov"])[0])
        up_dvl = jax.jit(lambda s: pukf.update_velocity(s, params, ms["dvl"], ms["dvl_cov"])[0])
        up_press = jax.jit(lambda s: pukf.update_pressure(s, params, ms["press"], ms["press_cov"])[0])
        up_adcp = jax.jit(
            lambda s: pukf.update_water_velocity(s, params, ms["adcp"], ms["adcp_cov"], 0.5)[0]
        )
        up_eff = jax.jit(lambda s: pukf.update_body_efforts(s, params, ms["eff"], ms["eff_cov"])[0])

        def second(s):
            for k in range(FULL_TICKS):
                s = predict(s)
                s = up_acc(s)
                if _DVL_AT(k):
                    s = up_dvl(s)
                if _PRESS_AT(k):
                    s = up_press(s)
                if _ADCP_AT(k):
                    s = up_adcp(s)
                if _EFF_AT(k):
                    s = up_eff(s)
            return s

        state = second(state)  # compile all phases
        jax.block_until_ready(state.cov)
        best = 0.0
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                state = second(state)
            jax.block_until_ready(state.cov)
            best = max(best, iters * FULL_TICKS / (time.perf_counter() - t0))
        return best


def measure_mission_ate(dtype_name: str):
    """1-minute ICRA'18 mission replay on the current default backend at the
    deployment dtype — the accuracy half of the north star, carried in the
    same bench artifact as the throughput number."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples"))
    import icra18_mission

    ate, dist = icra18_mission.main(["--minutes", "1.0", "--dtype", dtype_name])
    return float(ate), float(dist)


def measure_bank_ate(bank_n: int, minutes: float = 1.0):
    """Fleet-scale accuracy: the f32 ATE **distribution** over a Monte-Carlo
    bank replayed through the lanes-persistent production loop on the chip
    (``models/monte_carlo.run_fleet_mission``): per-instance on-device sensor
    noise, perturbed initial estimates, banked (per-instance) parameters.
    Returns the artifact dict (p50/p95/max, gate-acceptance spread, walls).

    Calibration note (measured r4, committed in tests/test_fleet_ate.py):
    the solo seed-0 replay's ATE sits in the lucky tail of the realization
    distribution (solo seeds 0-3: 0.027-0.074 m), so the distribution's p50
    is the honest fleet accuracy figure and the solo ``ate_m`` field remains
    the canonical seed-0 north-star number."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples"))
    import icra18_mission

    import jax.numpy as jnp

    from slam_uwv_kalman_filters_tpu.models import monte_carlo as mc
    from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod

    dtype = jnp.float32
    t0 = time.perf_counter()
    state, params, spec = icra18_mission.build_fleet_setup(
        minutes=minutes, rate=100.0, dtype_name="f32"
    )
    bstate = bankmod.replicate(state, bank_n)
    bstate = mc.perturb_initial_bank(
        bstate, jax.random.PRNGKey(7), pos_sigma=0.05, vel_sigma=0.05, yaw_sigma=3e-3
    )
    # the SAME banked parameter draw the calibrating test asserts bounds on
    bparams = icra18_mission.monte_carlo_params(params, bank_n, dtype)
    path = "lanes" if jax.default_backend() == "tpu" else "bank"
    run = jax.jit(
        lambda bs: mc.run_fleet_mission(
            bs, bparams, spec, jax.random.PRNGKey(42), path=path
        )
    )
    lowered_wall = time.perf_counter() - t0
    t1 = time.perf_counter()
    res = run(bstate)
    ate = np.asarray(jax.device_get(res.ate))
    gacc = np.asarray(jax.device_get(res.gps_accept_frac))
    compile_and_run = time.perf_counter() - t1
    t2 = time.perf_counter()
    res2 = run(bstate)
    np.asarray(jax.device_get(res2.ate))
    replay_wall = time.perf_counter() - t2
    if not np.all(np.isfinite(ate)):
        raise RuntimeError("bank ATE replay diverged: non-finite ATE")
    # noise-floor companion: the SAME fleet with exact initial estimates and
    # an unperturbed (but still banked, so the jaxpr — and therefore the
    # persistent-compile-cache entry — matches the headline run) parameter
    # set: the distribution over pure sensor-noise realizations, separating
    # what the mission's information content allows (p50 ≈ 0.07 m) from the
    # initial-scatter transient the headline distribution includes
    bstate0 = bankmod.replicate(state, bank_n)
    bparams0 = icra18_mission.monte_carlo_params(
        params, bank_n, dtype, scale_sigma=0.0, p_atm_sigma=0.0
    )
    res_nf = jax.jit(
        lambda bs: mc.run_fleet_mission(
            bs, bparams0, spec, jax.random.PRNGKey(42), path=path
        )
    )(bstate0)
    ate_nf = np.asarray(jax.device_get(res_nf.ate))
    return {
        "ate_bank_n": bank_n,
        "ate_bank_p50": round(float(np.percentile(ate, 50)), 4),
        "ate_bank_p95": round(float(np.percentile(ate, 95)), 4),
        "ate_bank_max": round(float(ate.max()), 4),
        "ate_noise_floor_p50": round(float(np.percentile(ate_nf, 50)), 4),
        "ate_noise_floor_max": round(float(ate_nf.max()), 4),
        "gate_accept_min": round(float(gacc.min()), 4),
        "gate_accept_mean": round(float(gacc.mean()), 4),
        "ate_bank_path": path,
        "ate_bank_compile_plus_replay_s": round(compile_and_run + lowered_wall, 1),
        "ate_bank_replay_s": round(replay_wall, 1),
    }


def bench_online_latency(bank_n, ticks=400):
    """Online/latency axis of the north star (VERDICT r3 item 4): per-tick
    wall latency of the real-time estimator pattern — every tick is a
    SEPARATE jitted dispatch of the single-launch whole-step kernel
    (predict + IMU acceleration + DVL chain, ``pose_update_fused.step_lanes``)
    with host-fresh measurements in and a host readback closing the tick,
    exactly what a 100 Hz host loop would pay per sample. Returns
    (p50_ms, p99_ms, compile_s).

    The axon runtime serves repeated identical executions from a cache
    (docs/TUNING.md), so the measurement chains the carry AND perturbs the
    measurement host-side every tick. On the remote-tunnel dev backend the
    figure (~27 ms p50 at bank 1 AND bank 128) is dominated by tunnel
    dispatch RTT, not device time — the bank-independence is the tell; on a
    locally-attached chip expect low-single-digit ms."""
    import jax.numpy as jnp

    from slam_uwv_kalman_filters_tpu.models import pose_fused as pf
    from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf
    from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod

    dtype = jnp.float32
    state, params, ms = _pose_full_setup(dtype)
    bstate = bankmod.replicate(state, bank_n)
    bstate = bstate._replace(
        rotation_rate=jnp.broadcast_to(ms["gyro"], (bank_n, 3))
    )
    ls = pf.to_lanes(bstate)
    acc_b = jnp.broadcast_to(ms["acc"], (bank_n, 3))

    step = jax.jit(
        lambda ls, z: puf.step_lanes(
            ls, params, 0.01,
            [
                puf.StepUpdate("acceleration", acc_b, ms["acc_cov"]),
                puf.StepUpdate("velocity", z, ms["dvl_cov"]),
            ],
        )[0]
    )
    probe = jax.jit(lambda l: l.mu_t.reshape(-1)[0])
    z0 = np.tile(np.array([0.3, 0.0, 0.0], np.float32), (bank_n, 1))

    t0 = time.perf_counter()
    ls = step(ls, jnp.asarray(z0))
    probe(ls).item()
    compile_s = time.perf_counter() - t0

    lat = []
    for k in range(ticks):
        zk = jnp.asarray(z0 + 1e-5 * np.sin(k))  # host-fresh measurement
        t1 = time.perf_counter()
        ls = step(ls, zk)
        probe(ls).item()  # readback closes the tick
        lat.append(time.perf_counter() - t1)
    lat_ms = np.asarray(lat) * 1e3
    return (
        float(np.percentile(lat_ms, 50)),
        float(np.percentile(lat_ms, 99)),
        float(compile_s),
    )


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
        # amortize the remote-tunnel dispatch with an in-program fori_loop
        # (tools/roofline.py hazard list): the small-filter kernels run
        # ~1-2 ms/launch, and per-dispatch RTT on this backend drifts into
        # the tens of ms in long-lived processes — host-loop timing then
        # measures the tunnel, not the chip (observed 12x on BottomUKF).
        # XLA cannot fuse across fori_loop iterations, so each is a real
        # kernel pass; the carry chains so no result is cache-served.
        inner = int(os.environ.get("BENCH_INNER", "25"))
        to_lanes, lanes_step = lanes
        jstep = jax.jit(
            lambda ls: jax.lax.fori_loop(
                0, inner, lambda i, l: lanes_step(l, z, r), ls
            )
        )
        ls = to_lanes(bstate)
        sync = _make_sync(ls.cov_t)
        ls = jstep(ls)  # compile + warm
        sync(ls.cov_t)
        t0 = time.perf_counter()
        for _ in range(iters):
            ls = jstep(ls)
        sync(ls.cov_t)
        dt = time.perf_counter() - t0
        return bank_n * iters * inner / dt

    banked = getattr(step, "bank_step", None)

    @jax.jit
    def bank_step(bs):
        if banked is not None:
            return banked(bs, z, r)
        return jax.vmap(step)(bs, z, r)

    sync = _make_sync(bstate.cov)
    bstate = bank_step(bstate)  # compile + warm
    sync(bstate.cov)
    t0 = time.perf_counter()
    for _ in range(iters):
        bstate = bank_step(bstate)
    sync(bstate.cov)
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


def load_canonical_baseline(scenario: str):
    """Committed single-core baseline (BASELINE_CPU.json) — median of long
    idle-host runs; keeps ``vs_baseline`` from moving with shared-host noise."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_CPU.json")
    try:
        with open(path) as f:
            data = json.load(f)
        return float(data["scenarios"][scenario]["steps_per_sec"])
    except (OSError, KeyError, ValueError, TypeError):
        return None


def main():
    # safety nets: whatever happens, emit the artifact before the driver's
    # hard timeout can strike (round-4 lesson). SIGALRM catches pure-Python
    # overruns; the watchdog thread catches main-thread-blocked-in-C hangs.
    signal.signal(signal.SIGALRM, _emit_and_exit)
    signal.alarm(int(_DEADLINE_S) + 45)
    watchdog = _arm_watchdog()
    # persistent compile cache: the fused kernels take ~1-2 min of (remote)
    # compile per shape on first use; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    scenario = os.environ.get("BENCH_SCENARIO", "pose_full")
    # the north star names a 100k-instance bank; 131072 is the next
    # lane-aligned power of two. The single-sensor scenarios keep 65536.
    bank_n = int(os.environ.get("BENCH_BANK", "131072" if scenario == "pose_full" else "65536"))
    iters = int(os.environ.get("BENCH_ITERS", "3" if scenario == "pose_full" else "30"))
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
        f"dtype={jnp.dtype(dtype).name} deadline={_DEADLINE_S:.0f}s"
    )

    # ---- phase 1: the HEADLINE metric, before anything optional ----------
    _PHASE[0] = "headline"
    if scenario == "pose_full":
        # lanes-persistent steady-state loop by default on the TPU f32 path
        # (BENCH_POSE_PATH=bank forces the public bank-API chain — the
        # conservative layout-converting route; measured gap in TUNING.md
        # "Roofline" section)
        pose_path = os.environ.get("BENCH_POSE_PATH", "lanes")
        use_lanes = (
            pose_path in ("lanes", "steps")
            and jax.default_backend() == "tpu"
            and jnp.dtype(dtype) == jnp.float32
        )
        t0 = time.perf_counter()
        if use_lanes:
            value = bench_pose_full_tpu_lanes(bank_n, iters, dtype, steps=pose_path == "steps")
        else:
            value = bench_pose_full_tpu(bank_n, iters, dtype)
        batched_wall = time.perf_counter() - t0
        _log(f"batched: {value:.0f} ticks/s (wall {batched_wall:.1f}s)")
        metric = "pose_full_mission_ticks_per_sec_per_chip"
        unit = "mission-ticks/s"
        live_baseline_fn = bench_pose_full_cpu_single
    else:
        pose_path, use_lanes = None, False
        state, params, step = build_step(dtype, scenario)
        t0 = time.perf_counter()
        value = bench_tpu_bank(state, step, bank_n, iters, dtype)
        batched_wall = time.perf_counter() - t0
        _log(f"batched: {value:.0f} steps/s (wall {batched_wall:.1f}s)")
        metric = f"{scenario}_ukf_predict_update_steps_per_sec_per_chip"
        unit = "filter-steps/s"
        live_baseline_fn = lambda: bench_cpu_single(scenario)

    baseline = load_canonical_baseline(scenario)
    vs_baseline = value / baseline if baseline else float("nan")
    if baseline is not None:
        _log(f"canonical CPU baseline: {baseline:.0f} steps/s (BASELINE_CPU.json)")
    _OUT.update(
        {
            "metric": metric,
            "value": round(value, 1),
            "unit": unit,
            "vs_baseline": round(vs_baseline, 2) if np.isfinite(vs_baseline) else None,
            "bank": bank_n,
            "batched_wall_s": round(batched_wall, 1),
        }
    )
    if scenario == "pose_full":
        # self-describing artifact: which code path produced the number
        # (lanes = lanes-persistent kernel loop, steps = whole-step fused
        # kernel, bank = public bank-API chain)
        _OUT["path"] = pose_path if use_lanes else "bank"

    # ---- phase 2: solo mission ATE (the accuracy half of the north star) --
    if (
        os.environ.get("BENCH_ATE", "1") != "0"
        and scenario == "pose_full"
        and _phase_budget_ok("mission ATE", 150.0)
    ):
        try:
            t0 = time.perf_counter()
            ate, dist = measure_mission_ate("f32")
            ate_wall = time.perf_counter() - t0
            _log(
                f"mission ATE (f32, {backend}): {ate:.4f} m over {dist:.0f} m "
                f"(wall {ate_wall:.1f}s)"
            )
            _OUT.update(
                {
                    "ate_m": round(ate, 4),
                    "ate_dtype": "float32",
                    "ate_bound_m": 0.10,
                    # replay route (self-describing artifact): the lanes
                    # bank-of-1 loop on TPU (measured 9x lower wall, same
                    # mission), generic scan on CPU
                    "ate_path": "lanes" if backend == "tpu" else "generic",
                    "ate_wall_s": round(ate_wall, 1),
                }
            )
        except Exception as e:
            _log(f"ATE replay failed: {e}")

    # ---- phase 3: fleet ATE distribution over a Monte-Carlo bank ----------
    # default ON only where it belongs: a 1024-instance, 6000-tick fleet
    # replay (twice, with the noise-floor companion) is a seconds-scale TPU
    # job but an hours-scale generic-path CPU job
    bank_ate_n = int(
        os.environ.get("BENCH_BANK_ATE", "1024" if backend == "tpu" else "0")
    )
    if (
        bank_ate_n > 0
        and scenario == "pose_full"
        and _phase_budget_ok("fleet ATE", 150.0)
    ):
        try:
            bank_ate = measure_bank_ate(bank_ate_n)
            _log(f"fleet ATE distribution: {bank_ate}")
            _OUT.update(bank_ate)
        except Exception as e:
            _log(f"fleet ATE replay failed: {e}")

    # ---- phases 4-6: extra scenario lines (VERDICT r3 items 6+8) ----------
    extra_scenarios = {}
    _OUT["scenarios"] = extra_scenarios
    if scenario == "pose_full":
        if (
            use_lanes
            and os.environ.get("BENCH_SURFACE", "1") != "0"
            and _phase_budget_ok("surface transit", 120.0)
        ):
            try:
                t0 = time.perf_counter()
                v_surf = bench_pose_surface_tpu_lanes(bank_n, iters, dtype)
                _log(f"surface transit: {v_surf:.0f} ticks/s "
                     f"(wall {time.perf_counter()-t0:.1f}s)")
                extra_scenarios["pose_surface"] = {
                    "value": round(v_surf, 1), "unit": "mission-ticks/s", "bank": bank_n,
                }
            except Exception as e:
                _log(f"surface scenario failed: {e}")
        small_default = "1" if jax.default_backend() == "tpu" else "0"
        if os.environ.get("BENCH_SMALL", small_default) != "0":
            for sc in ("velocity", "bottom", "indirect"):
                if not _phase_budget_ok(f"small filter {sc}", 60.0):
                    break
                try:
                    t0 = time.perf_counter()
                    sc_bank = 65536
                    s_state, s_params, s_step = build_step(dtype, sc)
                    v_sc = bench_tpu_bank(s_state, s_step, sc_bank, 30, dtype)
                    base_sc = load_canonical_baseline(sc)
                    _log(f"{sc}: {v_sc:.0f} steps/s "
                         f"(wall {time.perf_counter()-t0:.1f}s)")
                    extra_scenarios[sc] = {
                        "value": round(v_sc, 1),
                        "unit": "filter-steps/s",
                        "bank": sc_bank,
                        "vs_baseline": (
                            round(v_sc / base_sc, 2) if base_sc else None
                        ),
                    }
                except Exception as e:
                    _log(f"{sc} scenario failed: {e}")
        if (
            use_lanes
            and os.environ.get("BENCH_LATENCY", "1") != "0"
            and _phase_budget_ok("online latency", 90.0)
        ):
            try:
                for nb_l in (1, 128):
                    p50, p99, compile_s = bench_online_latency(nb_l)
                    _log(f"online latency bank {nb_l}: p50 {p50:.2f} ms, "
                         f"p99 {p99:.2f} ms (compile {compile_s:.1f}s)")
                    extra_scenarios[f"online_bank{nb_l}"] = {
                        "latency_p50_ms": round(p50, 3),
                        "latency_p99_ms": round(p99, 3),
                        "compile_s": round(compile_s, 1),
                    }
            except Exception as e:
                _log(f"latency scenario failed: {e}")
    if not extra_scenarios:
        del _OUT["scenarios"]

    # ---- phase 7 (LAST — flips jax_enable_x64): live CPU baseline check ---
    # Persistent-cache writes OFF from here: the baseline compiles XLA:CPU
    # executables >1s, and the PjRt executable.serialize() inside the cache
    # WRITE path has segfaulted (flaky, XLA:CPU + interpret-Pallas custom
    # calls — see tests/conftest.py). A segfault in this advisory phase
    # would lose the fully-accumulated artifact; a cache write here never
    # pays back in a fresh driver environment. Reads stay enabled.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    if baseline is not None:
        if (
            os.environ.get("BENCH_CHECK_BASELINE", "1") != "0"
            and _phase_budget_ok("live baseline check", 150.0)
        ):
            try:
                live = live_baseline_fn()
                drift = live / baseline
                _log(f"live baseline sanity check: {live:.0f} steps/s ({drift:.2f}x canonical)")
            except Exception as e:
                _log(f"live baseline sanity check failed: {e}")
    elif _phase_budget_ok("live baseline (no canonical)", 150.0):
        _log("no canonical baseline for this scenario — measuring live")
        try:
            live = live_baseline_fn()
            _log(f"single-instance CPU baseline (live): {live:.0f} steps/s")
            _OUT["vs_baseline"] = round(value / live, 2)
        except Exception as e:
            _log(f"baseline measurement failed: {e}")

    signal.alarm(0)
    watchdog.cancel()
    _emit_and_exit()


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the artifact contract is
        # "ALWAYS one JSON line": a dead TPU backend (e.g. 'Unable to
        # initialize backend axon: UNAVAILABLE', observed live when the
        # remote terminal died) must yield a parseable artifact naming the
        # failure, not a bare traceback
        _OUT.setdefault("error", f"{type(e).__name__}: {e}"[:300])
        _log(f"bench aborted during {_PHASE[0]!r}: {e}")
        _emit_and_exit()
