"""Native runtime tests: C++ event packer and DelayedStates bindings (with
NumPy-fallback parity), and the packer → PoseInputs → scan-driver seam."""

import numpy as np
import pytest

from slam_uwv_kalman_filters_tpu import runtime as rt


def make_stream(rng):
    ts, sid, pay = [], [], []
    for k in range(200):  # 100 Hz gyro with jitter
        ts.append(k * 10_000 + int(rng.integers(-400, 400)))
        sid.append(0)
        pay.append(np.r_[rng.normal(0, 1, 3), 0, 0, 0])
    for k in range(10):  # 5 Hz DVL
        ts.append(k * 200_000)
        sid.append(1)
        pay.append(np.r_[1.0, 2.0, 3.0, 0, 0, 0])
    for k in range(4):  # 2 Hz pressure
        ts.append(k * 500_000)
        sid.append(2)
        pay.append(np.r_[101325.0, 0, 0, 0, 0, 0])
    return np.array(ts), np.array(sid, np.int32), np.array(pay)


def test_pack_schedule_native():
    assert rt.build(), "native runtime must compile in this image"
    rng = np.random.default_rng(5)
    ts, sid, pay = make_stream(rng)
    perm = rng.permutation(len(ts))  # out-of-order delivery
    vals, valid, dropped = rt.pack_schedule(
        ts[perm], sid[perm], pay[perm], np.array([3, 3, 1]), 0, 10_000, 200
    )
    assert dropped == 0
    assert vals.shape == (3, 200, 6)
    assert valid[1].sum() == 10 and valid[2].sum() == 4
    np.testing.assert_allclose(vals[1, 20, :3], [1.0, 2.0, 3.0])
    # event outside the horizon is dropped and counted
    _, _, d2 = rt.pack_schedule(
        np.array([99_000_000_000]), np.array([0], np.int32), np.zeros((1, 6)),
        np.array([3, 3, 1]), 0, 10_000, 200,
    )
    assert d2 == 1


def test_pack_schedule_latest_wins():
    # two DVL events land in the same tick; the later timestamp must win even
    # when delivered first
    ts = np.array([5_000, 2_000])
    sid = np.array([0, 0], np.int32)
    pay = np.array([[10.0, 0, 0], [20.0, 0, 0]])
    vals, valid, dropped = rt.pack_schedule(ts, sid, pay, np.array([3]), 0, 10_000, 1)
    assert valid[0, 0] and dropped == 0
    np.testing.assert_allclose(vals[0, 0, :1], [10.0])  # ts=5000 is later


def test_native_matches_numpy_fallback(monkeypatch):
    rng = np.random.default_rng(7)
    ts, sid, pay = make_stream(rng)
    v1, f1, d1 = rt.pack_schedule(ts, sid, pay, np.array([3, 3, 1]), 0, 10_000, 200)
    # force the NumPy fallback
    monkeypatch.setattr(rt, "_load", lambda: None)
    v2, f2, d2 = rt.pack_schedule(ts, sid, pay, np.array([3, 3, 1]), 0, 10_000, 200)
    np.testing.assert_allclose(v1, v2)
    np.testing.assert_array_equal(f1, f2)
    assert d1 == d2


def test_forward_fill_semantics():
    vals = np.zeros((5, 3))
    valid = np.array([0, 1, 0, 0, 1], np.uint8)
    vals[1] = [1.0, 2.0, 3.0]
    vals[4] = [9.0, 9.0, 9.0]
    out, f = rt.forward_fill(vals, valid, np.array([-1.0, -1.0, -1.0]))
    assert f.all()
    np.testing.assert_allclose(out[0], [-1, -1, -1])  # initial value
    np.testing.assert_allclose(out[2], [1, 2, 3])  # carried forward
    np.testing.assert_allclose(out[4], [9, 9, 9])  # fresh event kept


def test_native_delayed_states_matches_jit_buffer():
    """C++ buffer and the jit-safe device buffer agree on lookups."""
    import jax.numpy as jnp

    from slam_uwv_kalman_filters_tpu.utils import delayed_states as ds

    nb = rt.NativeDelayedStates(8, 2, 1.0)
    jb = ds.make_buffer(8, 2, 1.0)
    for k in range(12):
        ts = k * 100_000
        v = np.array([float(k), -float(k)])
        c = np.eye(2) * (k + 1)
        nb.push(ts, v, c)
        jb = ds.push(jb, jnp.asarray(ts, jnp.int64), jnp.asarray(v), jnp.asarray(c))
    for q in [450_000, 900_000, 1_150_000]:
        v1, c1, f1 = nb.closest(q)
        v2, c2, f2 = ds.closest(jb, jnp.asarray(q, jnp.int64))
        assert bool(f1) == bool(f2)
        np.testing.assert_allclose(v1, np.asarray(v2))
    # horizon behavior identical
    _, _, f1 = nb.closest(99_000_000)
    _, _, f2 = ds.closest(jb, jnp.asarray(99_000_000, jnp.int64))
    assert not f1 and not bool(f2)


def test_packer_feeds_pose_driver():
    """End-to-end seam: native packer output → make_inputs → one driver tick."""
    import jax.numpy as jnp

    from slam_uwv_kalman_filters_tpu.models import pose_driver as drv
    from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
    from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn
    from slam_uwv_kalman_filters_tpu.ops import manifolds as mf
    from slam_uwv_kalman_filters_tpu.utils.config import default_pose_ukf_config

    rng = np.random.default_rng(9)
    ts, sid, pay = make_stream(rng)
    vals, valid, _ = rt.pack_schedule(ts, sid, pay, np.array([3, 3, 1]), 0, 10_000, 200)
    gyro, _ = rt.forward_fill(vals[0, :, :3].copy(), valid[0].astype(np.uint8).copy(), np.zeros(3))

    inputs = drv.make_inputs(
        200, 0.01, gyro,
        dvl=vals[1, :, :3], dvl_cov=np.eye(3) * 1e-3, dvl_valid=valid[1],
        pressure=vals[2, :, :1], pressure_cov=np.eye(1) * 1e4, pressure_valid=valid[2],
    )
    state, params = pukf.init_from_pose(
        jnp.zeros(3), jnp.eye(3) * 0.01, mf.quat_identity(), jnp.eye(3) * 1e-4,
        default_pose_ukf_config(), dyn.default_uwv_parameters(),
    )
    import jax

    one = jax.tree_util.tree_map(lambda a: a[0], inputs)
    state2, out = drv.pose_step(state, params, one)
    assert np.isfinite(float(out.cov_trace))


def test_forward_fill_short_initial_zero_extends():
    """`initial` shorter than the row stride (shared widest-sensor stride)
    must zero-extend identically on the native and NumPy paths (regression:
    the native call read past the end of a short `initial` buffer)."""
    vals = np.zeros((4, 6))
    vals[2, :3] = [7.0, 8.0, 9.0]
    valid = np.array([0, 0, 1, 0], np.uint8)
    out, f = rt.forward_fill(vals.copy(), valid.copy(), np.array([1.0, 2.0, 3.0]))
    assert f.all()
    np.testing.assert_allclose(out[0], [1, 2, 3, 0, 0, 0])  # zero-extended initial
    np.testing.assert_allclose(out[1], [1, 2, 3, 0, 0, 0])
    np.testing.assert_allclose(out[3], [7, 8, 9, 0, 0, 0])  # carried full row
    try:
        rt.forward_fill(vals.copy(), valid.copy(), np.zeros(9))
        assert False, "expected ValueError for initial longer than stride"
    except ValueError:
        pass


def test_pack_schedule_rejects_bad_arguments():
    """Both paths must raise identically on degenerate grids (regression: the
    native path returned its -1 error code as the dropped count, while the
    NumPy path died on a ZeroDivisionError)."""
    ts = np.array([1_000])
    sid = np.array([0], np.int32)
    pay = np.zeros((1, 3))
    with pytest.raises(ValueError, match="dt_us"):
        rt.pack_schedule(ts, sid, pay, np.array([3]), 0, 0, 10)
    with pytest.raises(ValueError, match="n_ticks"):
        rt.pack_schedule(ts, sid, pay, np.array([3]), 0, 10_000, -1)
    with pytest.raises(ValueError, match="sensor_dims"):
        rt.pack_schedule(ts, sid, pay, np.zeros(0, np.int32), 0, 10_000, 10)


def test_native_delayed_states_rejects_bad_sizes():
    """Regression: capacity<=0 was a modulo-by-zero in the C++ push, and a
    short value/cov buffer was an out-of-bounds memcpy read."""
    with pytest.raises(ValueError):
        rt.NativeDelayedStates(0, 3, 1.0)
    with pytest.raises(ValueError):
        rt.NativeDelayedStates(8, -1, 1.0)
    nb = rt.NativeDelayedStates(8, 3, 1.0)
    with pytest.raises(ValueError, match="push expects"):
        nb.push(0, np.zeros(2), np.zeros((2, 2)))
    with pytest.raises(ValueError, match="push expects"):
        nb.push(0, np.zeros(3), np.zeros((3, 2)))
    nb.push(0, np.zeros(3), np.zeros((3, 3)))  # correct shapes still accepted


# ---------------------------------------------------------------------------
# StreamPacker — incremental windowed ingest (native + fallback parity)
# ---------------------------------------------------------------------------


def _stream_events(rng, n_windows=4, window_ticks=50, dt=10_000):
    """Multi-rate events spanning n_windows windows, shuffled."""
    ts, sid, pay = [], [], []
    horizon = n_windows * window_ticks * dt
    for k in range(horizon // dt):  # sensor 0 at tick rate
        ts.append(k * dt + int(rng.integers(0, dt // 2)))
        sid.append(0)
        pay.append(np.r_[rng.normal(0, 1, 3), 0, 0, 0])
    for k in range(horizon // 200_000):  # sensor 1 at 5 Hz
        ts.append(k * 200_000)
        sid.append(1)
        pay.append(np.r_[1.0 + k, 2.0, 3.0, 0, 0, 0])
    ts = np.array(ts, np.int64)
    sid = np.array(sid, np.int32)
    pay = np.array(pay)
    # time-sorted globally: the streamer releases a window once the push
    # watermark passes it, so delivery must not jump backwards across whole
    # windows; the tests shuffle WITHIN each push chunk (bounded reordering)
    order = np.argsort(ts, kind="stable")
    return ts[order], sid[order], pay[order]


def test_stream_packer_matches_batch_packer():
    """Windows released by the streamer, concatenated, equal the one-shot
    batch packer over the same horizon."""
    assert rt.build(), "native runtime must compile in this image"
    rng = np.random.default_rng(11)
    dims = np.array([3, 3], np.int32)
    ts, sid, pay = _stream_events(rng)
    ref_vals, ref_valid, _ = rt.pack_schedule(ts, sid, pay, dims, 0, 10_000, 200)

    sp = rt.StreamPacker(dims, t0_us=0, dt_us=10_000, window_ticks=50, payload_stride=6)
    got_vals, got_valid = [], []
    # deliver in chunks (shuffled within each — out-of-order within a push is
    # fully supported), popping whatever is ready between pushes
    for chunk in np.array_split(np.arange(len(ts)), 7):
        chunk = rng.permutation(chunk)
        sp.push(ts[chunk], sid[chunk], pay[chunk])
        while True:
            out = sp.pop()
            if out is None:
                break
            w, v, f = out
            assert w == len(got_vals)
            got_vals.append(v)
            got_valid.append(f)
    while True:  # flush the tail
        out = sp.pop(force=True)
        if out is None:
            break
        got_vals.append(out[1])
        got_valid.append(out[2])
    assert len(got_vals) == 4
    np.testing.assert_allclose(np.concatenate(got_vals, axis=1), ref_vals)
    np.testing.assert_array_equal(np.concatenate(got_valid, axis=1), ref_valid)
    assert sp.dropped == 0


def test_stream_packer_late_events_dropped():
    dims = np.array([2], np.int32)
    sp = rt.StreamPacker(dims, t0_us=0, dt_us=1_000, window_ticks=10)
    # watermark passes window 0 (event in window 1), window 0 releases
    assert sp.push([10_500], [0], [[1.0, 2.0]]) == 0
    assert sp.ready()
    w, v, f = sp.pop()
    assert w == 0 and not f.any()
    # a late event for the released window 0 is dropped and counted
    assert sp.push([500], [0], [[9.0, 9.0]]) == 1
    assert sp.dropped == 1
    # negative-time and bad-id events are dropped too
    assert sp.push([-5, 5_000_000], [0, 7], [[0.0, 0.0], [0.0, 0.0]]) == 2
    # window 1 still releases with its event once forced or watermark passes
    w, v, f = sp.pop(force=True)
    assert w == 1 and f[0, 0]
    np.testing.assert_allclose(v[0, 0, :2], [1.0, 2.0])
    # nothing further staged: forced pop reports exhaustion
    assert sp.pop(force=True) is None


def test_stream_packer_numpy_fallback_parity(monkeypatch):
    rng = np.random.default_rng(13)
    dims = np.array([3, 3], np.int32)
    ts, sid, pay = _stream_events(rng)

    def run(sp):
        outs = []
        for chunk in np.array_split(np.arange(len(ts)), 5):
            chunk = np.random.default_rng(int(chunk[0])).permutation(chunk)
            sp.push(ts[chunk], sid[chunk], pay[chunk])
            while (out := sp.pop()) is not None:
                outs.append(out)
        while (out := sp.pop(force=True)) is not None:
            outs.append(out)
        return outs

    native = run(rt.StreamPacker(dims, 0, 10_000, 50, payload_stride=6))
    monkeypatch.setattr(rt, "_load", lambda: None)
    fallback = run(rt.StreamPacker(dims, 0, 10_000, 50, payload_stride=6))
    assert len(native) == len(fallback) == 4
    for (wn, vn, fn), (wf, vf, ff) in zip(native, fallback):
        assert wn == wf
        np.testing.assert_allclose(vn, vf)
        np.testing.assert_array_equal(fn, ff)


def test_stream_packer_latest_wins_within_cell():
    dims = np.array([1], np.int32)
    sp = rt.StreamPacker(dims, t0_us=0, dt_us=10_000, window_ticks=2)
    # same (sensor, tick) cell, later timestamp delivered FIRST
    sp.push([5_000, 2_000, 30_000], [0, 0, 0], [[10.0], [20.0], [0.0]])
    w, v, f = sp.pop()
    assert w == 0 and f[0, 0]
    np.testing.assert_allclose(v[0, 0, 0], 10.0)  # ts=5000 wins
