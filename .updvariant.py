"""Streaming update-kernel prototype: no (107, 53, B) delta materialization.

The equilibrated Cholesky keeps finalized columns (diag + zero head) in
c_ref; the measurement model is evaluated on ±column slabs via an adapter,
the cross-covariance contracts the factor directly
(C = ½·dvec ⊙ Σ_j c_ref[j]·(Z⁺_j − Z⁻_j), exact because ±columns cancel zm),
and S comes from the small Z slabs. Compared numerically + timed against
production update_velocity_lanes.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_uwv_kalman_filters_tpu.models import pose_fused as pf
from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
from slam_uwv_kalman_filters_tpu.models import pose_update_fused as puf
from slam_uwv_kalman_filters_tpu.models.pose_fused import (
    NSIG, STORAGE_DIM, TANGENT_DIM, _qexp, _qmul, _qnorm4,
)
from slam_uwv_kalman_filters_tpu.models.pose_update_fused import (
    _model_measurement, _update_tail, FUSED_MODELS,
)
from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn
from slam_uwv_kalman_filters_tpu.ops import kernels
from slam_uwv_kalman_filters_tpu.ops.kernels import LANE_TILE
from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod
from slam_uwv_kalman_filters_tpu.utils.config import default_pose_ukf_config

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class _ColDeltas:
    """y_ref[:, k, :]-style view over ±factor columns: sign·c_ref[:, k]·dvec[k]."""

    def __init__(self, c_ref, dvec, sign):
        self.c_ref = c_ref
        self.dvec = dvec
        self.sign = sign

    def __getitem__(self, idx):
        _, k, _ = idx
        return self.sign * self.c_ref[:, k] * self.dvec[k : k + 1]


class _ZeroDeltas:
    def __init__(self, b, dtype):
        self.z = jnp.zeros((1, b), dtype)

    def __getitem__(self, idx):
        return self.z


def make_streaming_update_kernel(model: str):
    m = FUSED_MODELS[model]
    n = TANGENT_DIM

    def kernel(z_ref, r_ref, mu_ref, cov_ref, scal_ref,
               covo_ref, muo_ref, m2_ref, acc_ref, nu_ref, c_ref):
        b = cov_ref.shape[-1]
        dtype = cov_ref.dtype
        mu = mu_ref[:]
        aux = tuple(scal_ref[1 + i, 0] for i in range(5))

        # keep-columns equilibrated Cholesky (diag kept, zero head)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        diag = jnp.concatenate([cov_ref[j, j : j + 1, :] for j in range(n)], axis=0)
        dvec = jnp.sqrt(jnp.maximum(diag, tiny))
        dinv = 1.0 / dvec
        for j in range(n):
            rs = (j // 8) * 8
            c_ref[j, rs:] = cov_ref[j, rs:] * (dinv[j : j + 1, :] * dinv[rs:])
        for jb in range(0, n, 16):
            je = min(jb + 16, n)
            rowt = row[jb:]
            for j in range(jb, je):
                colt = c_ref[j, jb:]
                for jj in range(jb, j):
                    bt = c_ref[jj, jb:]
                    colt = colt - bt[j - jb : j - jb + 1] * bt
                dj = jnp.sqrt(colt[j - jb : j - jb + 1])
                belowt = jnp.where(rowt > j, colt * (1.0 / dj), jnp.zeros((), dtype))
                keep = jnp.where(rowt == j, dj, belowt)
                if jb:
                    c_ref[j] = jnp.concatenate(
                        [jnp.zeros((jb, b), dtype), keep], axis=0
                    )
                else:
                    c_ref[j] = keep
            if je < n:
                cut = je - jb
                upd = None
                for jj in range(jb, je):
                    bt = c_ref[jj, jb:]
                    term = bt[cut:][:, None, :] * bt[cut:][None, :, :]
                    upd = term if upd is None else upd + term
                c_ref[je:, je:] = c_ref[je:, je:] - upd

        # measurement components on ±column slabs (m × (53, B)) and point 0
        Zp = _model_measurement(model, mu, _ColDeltas(c_ref, dvec, 1.0), aux)
        Zm = _model_measurement(model, mu, _ColDeltas(c_ref, dvec, -1.0), aux)
        Z0 = _model_measurement(model, mu, _ZeroDeltas(b, dtype), aux)

        inv_n = 1.0 / NSIG
        zm = [
            (Z0[a] + jnp.sum(Zp[a], axis=0, keepdims=True)
             + jnp.sum(Zm[a], axis=0, keepdims=True)) * inv_n
            for a in range(m)
        ]
        z_in = z_ref[:]
        nu = jnp.concatenate([z_in[a : a + 1] - zm[a] for a in range(m)], axis=0)
        nu_ref[:] = nu

        # S = ½ Σ dz dzᵀ + R over {0, +cols, −cols}
        dzp = [Zp[a] - zm[a] for a in range(m)]
        dzm = [Zm[a] - zm[a] for a in range(m)]
        dz0 = [Z0[a] - zm[a] for a in range(m)]
        r = r_ref[:]
        S = [[None] * m for _ in range(m)]
        for a in range(m):
            for b2 in range(a + 1):
                v = 0.5 * (
                    jnp.sum(dzp[a] * dzp[b2], axis=0, keepdims=True)
                    + jnp.sum(dzm[a] * dzm[b2], axis=0, keepdims=True)
                    + dz0[a] * dz0[b2]
                ) + r[a, b2 : b2 + 1, :]
                S[a][b2] = v
                S[b2][a] = v

        # C = ½ dvec ⊙ Σ_j c_ref[j]·(Z⁺_j − Z⁻_j)  (exact: ± cancels zm)
        C = [
            0.5 * dvec * jnp.sum(c_ref[:] * (Zp[a] - Zm[a])[:, None, :], axis=0)
            for a in range(m)
        ]

        # ---- remaining tail: identical math to _update_tail after S/C ------
        L = [[None] * m for _ in range(m)]
        for j in range(m):
            s = S[j][j]
            for k in range(j):
                s = s - L[j][k] * L[j][k]
            dgj = jnp.sqrt(s)
            L[j][j] = dgj
            inv_d = 1.0 / dgj
            for i in range(j + 1, m):
                t = S[i][j]
                for k in range(j):
                    t = t - L[i][k] * L[j][k]
                L[i][j] = t * inv_d
        inv_diag = [1.0 / L[i][i] for i in range(m)]
        W = [None] * m
        for i in range(m):
            t = C[i]
            for k in range(i):
                t = t - L[i][k] * W[k]
            W[i] = t * inv_diag[i]
        y = [None] * m
        for i in range(m):
            t = nu[i : i + 1, :]
            for k in range(i):
                t = t - L[i][k] * y[k]
            y[i] = t * inv_diag[i]
        m2 = sum(y[i] * y[i] for i in range(m))
        thr = scal_ref[0, 0]
        acc_b = jnp.logical_or(m2 <= thr, thr < 0.0)
        m2_ref[:] = m2
        acc_ref[:] = acc_b.astype(dtype)
        corr = sum(W[i] * y[i] for i in range(m))
        muo_ref[0:3] = jnp.where(acc_b, mu[0:3] + corr[0:3], mu[0:3])
        muo_ref[7:54] = jnp.where(acc_b, mu[7:54] + corr[6:53], mu[7:54])
        ew, ex, ey, ez = _qexp(corr[3:4][None], corr[4:5][None], corr[5:6][None])
        qw, qx, qy, qz = _qnorm4(
            *_qmul(mu[3:4][None], mu[4:5][None], mu[5:6][None], mu[6:7][None], ew, ex, ey, ez)
        )
        muo_ref[3:4] = jnp.where(acc_b, qw[0], mu[3:4])
        muo_ref[4:5] = jnp.where(acc_b, qx[0], mu[4:5])
        muo_ref[5:6] = jnp.where(acc_b, qy[0], mu[5:6])
        muo_ref[6:7] = jnp.where(acc_b, qz[0], mu[6:7])
        for nn in range(TANGENT_DIM):
            cp = cov_ref[nn, nn:]
            t = sum(W[i][nn : nn + 1] * W[i][nn:] for i in range(m))
            covo_ref[nn, nn:] = jnp.where(acc_b, cp - t, cp)

    return kernel


def streaming_update_lanes(model, lstate, z, meas_cov, gate_threshold=None):
    dtype = lstate.cov_t.dtype
    nb = lstate.cov_t.shape[-1]
    n = TANGENT_DIM
    m = FUSED_MODELS[model]
    z = jnp.asarray(z, dtype)
    meas_cov = jnp.broadcast_to(jnp.asarray(meas_cov, dtype), (z.shape[0], m, m))
    pad = nb - z.shape[0]
    z2, r2 = puf._pad_measurement(z, meas_cov, pad, m, dtype)
    scal = puf._scal_block(gate_threshold, (), dtype)
    lane_spec = kernels.lane_block_spec
    covo, muo, m2, acc, nu = pl.pallas_call(
        make_streaming_update_kernel(model),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, nb), dtype),
            jax.ShapeDtypeStruct((STORAGE_DIM, nb), dtype),
            jax.ShapeDtypeStruct((1, nb), dtype),
            jax.ShapeDtypeStruct((1, nb), dtype),
            jax.ShapeDtypeStruct((m, nb), dtype),
        ),
        grid=(nb // LANE_TILE,),
        in_specs=[
            lane_spec(m),
            lane_spec(m, m),
            lane_spec(STORAGE_DIM),
            lane_spec(n, n),
            pl.BlockSpec((6, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            lane_spec(n, n), lane_spec(STORAGE_DIM), lane_spec(1),
            lane_spec(1), lane_spec(m),
        ),
        scratch_shapes=[pltpu.VMEM((n, n, LANE_TILE), dtype)],
        interpret=False,
    )(z2.T, jnp.transpose(r2, (1, 2, 0)), lstate.mu_t, lstate.cov_t, scal)
    return lstate._replace(cov_t=covo, mu_t=muo), (m2, acc, nu)


def main():
    NB = 32768
    dtype = jnp.float32
    cfg = default_pose_ukf_config()
    model = dyn.default_uwv_parameters(dtype=dtype)
    state, params = pukf.init_from_pose(
        imu_in_nwu_pos=jnp.zeros(3, dtype),
        imu_in_nwu_pos_cov=jnp.eye(3, dtype=dtype) * 0.01,
        imu_in_nwu_rot=jnp.array([1.0, 0, 0, 0], dtype),
        imu_in_nwu_rot_cov=jnp.eye(3, dtype=dtype) * 1e-4,
        config=cfg, model_parameters=model, imu_delta_t=0.01, dtype=dtype,
    )
    state = pukf.integrate_rotation_rate(state, jnp.array([0.0, 0.0, 0.01], dtype))
    bstate = bankmod.replicate(state, NB)
    ls = jax.block_until_ready(pf.to_lanes(bstate))
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(scale=0.3, size=(NB, 3)), dtype)
    r = jnp.eye(3, dtype=dtype) * 1e-3

    # correctness: streaming vs production on the same lanes state
    prod, prod_info = jax.jit(
        lambda l: puf.update_velocity_lanes(l, params, z, r, None)
    )(ls)
    strm, (m2, acc, nu) = jax.jit(
        lambda l: streaming_update_lanes("velocity", l, z, r, None)
    )(ls)
    pc = np.asarray(jax.device_get(prod.cov_t))
    sc = np.asarray(jax.device_get(strm.cov_t))
    pm = np.asarray(jax.device_get(prod.mu_t))
    sm = np.asarray(jax.device_get(strm.mu_t))
    tri = np.tril_indices(TANGENT_DIM)
    dc = np.abs(pc[tri[1], tri[0], :] - sc[tri[1], tri[0], :]).max()
    dm = np.abs(pm - sm).max()
    dm2 = np.abs(
        np.asarray(jax.device_get(prod_info.mahalanobis2))
        - np.asarray(jax.device_get(m2[0, :NB]))
    ).max()
    print(f"max |Δcov(lower)| = {dc:.3e}   max |Δmu| = {dm:.3e}   max |Δm2| = {dm2:.3e}")

    def timeit(name, fn, iters=30):
        jfn = jax.jit(fn)
        l = jfn(ls)
        _ = float(jax.device_get(l.cov_t[0, 0, 0]))
        l = ls
        t0 = time.perf_counter()
        for _ in range(iters):
            l = jfn(l)
        _ = float(jax.device_get(l.cov_t[0, 0, 0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:36s} {dt*1e3:8.3f} ms")

    timeit("production update_velocity_lanes", lambda l: puf.update_velocity_lanes(l, params, z, r, None)[0])
    timeit("STREAMING update (no y scratch)", lambda l: streaming_update_lanes("velocity", l, z, r, None)[0])


if __name__ == "__main__":
    main()
