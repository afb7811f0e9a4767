"""Phase-ablated variants of the fused pose predict kernel (experiment only).

Variants cut the kernel after phase A / B / CD to locate where the 7.8 ms
per 32k-bank launch goes. Ablated variants keep outputs live by writing a
cheap reduction of the last computed tensor into cov_ref.
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_uwv_kalman_filters_tpu.models import pose_fused as pf
from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
from slam_uwv_kalman_filters_tpu.models.pose_fused import (
    LANE_TILE, MEAN_ITERS, NSIG, STORAGE_DIM, TANGENT_DIM,
    _qexp, _qlog, _qmul, _qnorm4,
    _S_DT, _S_LAT0, _S_MRADINV, _S_EARTHW, _S_WVQ, _S_QROT, _NSCAL,
)
from slam_uwv_kalman_filters_tpu.ops import dynamics as dyn
from slam_uwv_kalman_filters_tpu.ops import kernels
from slam_uwv_kalman_filters_tpu.ops.kernels import equilibrated_sigma_columns
from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod
from slam_uwv_kalman_filters_tpu.utils.config import default_pose_ukf_config

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_body(phases: str, mean_iters: int = MEAN_ITERS, full_row_e: bool = False, factor_input=False):
    def body(a_ref, mu_ref, rr_ref, coeff_ref, offs_ref, q0m_ref, scal_ref,
             cov_ref, muo_ref, y_ref, c_ref):
        n = TANGENT_DIM
        b = a_ref.shape[-1]
        f1 = lambda i: scal_ref[i, 0]
        dt = f1(_S_DT)
        mu = mu_ref[:]

        # phase A
        y_ref[0, 0:53] = jnp.zeros((n, b), mu.dtype)

        def _write_column(j, final):
            y_ref[2 * j + 1, 0:53] = final
            y_ref[2 * j + 2, 0:53] = -final

        if factor_input == "plain":
            # a_ref already holds L = chol(P): sigma columns are direct reads
            for j in range(n):
                col = a_ref[j]  # (53, B)
                _write_column(j, col)
        elif factor_input == "wide":
            # full-width (54-row) stores: no sublane masking
            zrow = jnp.zeros((1, b), mu.dtype)
            for j in range(n):
                col = jnp.concatenate([a_ref[j], zrow], axis=0)  # (54, B)
                y_ref[2 * j + 1] = col
                y_ref[2 * j + 2] = -col
        elif factor_input == "pair":
            # one (2, 54, B) store per +- pair
            zrow = jnp.zeros((1, b), mu.dtype)
            for j in range(n):
                col = jnp.concatenate([a_ref[j], zrow], axis=0)  # (54, B)
                y_ref[2 * j + 1 : 2 * j + 3] = jnp.stack([col, -col], axis=0)
        elif factor_input == "block":
            # contiguous layout: +cols at 1..53, -cols at 54..106, 8-col slabs
            zrow = jnp.zeros((1, b), mu.dtype)
            for jb in range(0, n, 8):
                je = min(jb + 8, n)
                cols = jnp.stack(
                    [jnp.concatenate([a_ref[j], zrow], axis=0) for j in range(jb, je)],
                    axis=0,
                )  # (<=8, 54, B)
                y_ref[1 + jb : 1 + je] = cols
                y_ref[54 + jb : 54 + je] = -cols
        else:
            equilibrated_sigma_columns(a_ref, c_ref, _write_column)
        if phases == "A":
            # cheap live-keeping: one reduced row of the deltas
            cov_ref[0] = jnp.sum(y_ref[:, 0:53], axis=0)
            muo_ref[:] = mu
            return

        # phase B
        coeff = coeff_ref[:]
        offs = offs_ref[:]
        rr = rr_ref[:]
        for lo, hi in ((0, 54), (54, NSIG)):
            d = y_ref[lo:hi, 0:53]
            x_pos = mu[0:3][None] + d[:, 0:3]
            x_flat = mu[7:54][None] + d[:, 6:53]
            ew, ex, ey, ez = _qexp(d[:, 3], d[:, 4], d[:, 5])
            qw, qx, qy, qz = _qmul(mu[3:4], mu[4:5], mu[5:6], mu[6:7], ew, ex, ey, ez)
            qw, qx, qy, qz = _qnorm4(qw, qx, qy, qz)
            x_vel = x_flat[:, 0:3]
            x_acc = x_flat[:, 3:6]
            y_pos = x_pos + dt * x_vel
            lat = f1(_S_LAT0) + x_pos[:, 0] * f1(_S_MRADINV)
            er_x = f1(_S_EARTHW) * jnp.cos(lat)
            er_z = f1(_S_EARTHW) * jnp.sin(lat)
            vx = rr[0:1] - x_flat[:, 6]
            vy = rr[1:2] - x_flat[:, 7]
            vz = rr[2:3] - x_flat[:, 8]
            tx = 2.0 * (qy * vz - qz * vy)
            ty = 2.0 * (qz * vx - qx * vz)
            tz = 2.0 * (qx * vy - qy * vx)
            wx = vx + qw * tx + (qy * tz - qz * ty) - er_x
            wy = vy + qw * ty + (qz * tx - qx * tz)
            wz = vz + qw * tz + (qx * ty - qy * tx) - er_z
            gw, gx, gy, gz = _qexp(wx * dt, wy * dt, wz * dt)
            yqw, yqx, yqy, yqz = _qnorm4(*_qmul(qw, qx, qy, qz, gw, gx, gy, gz))
            y_flat = x_flat + coeff[7:54][None] * (x_flat - offs[7:54][None])
            y_ref[lo:hi, 7:10] = x_vel + dt * x_acc
            y_ref[lo:hi, 10:54] = y_flat[:, 3:]
            y_ref[lo:hi, 0:3] = y_pos
            y_ref[lo:hi, 3] = yqw
            y_ref[lo:hi, 4] = yqx
            y_ref[lo:hi, 5] = yqy
            y_ref[lo:hi, 6] = yqz
        if phases == "AB":
            cov_ref[0] = jnp.sum(y_ref[:, 0:53], axis=0)
            muo_ref[:] = mu
            return

        # phase C
        inv_n = 1.0 / NSIG
        mean_flat = jnp.sum(y_ref[:, 7:54], axis=0) * inv_n
        mean_pos = jnp.sum(y_ref[:, 0:3], axis=0) * inv_n
        yqw = y_ref[:, 3, :]
        yqx = y_ref[:, 4, :]
        yqy = y_ref[:, 5, :]
        yqz = y_ref[:, 6, :]
        mw, mx, my, mz = yqw[0:1], yqx[0:1], yqy[0:1], yqz[0:1]
        for _ in range(mean_iters):
            lw, lx, ly, lz = _qmul(mw, -mx, -my, -mz, yqw, yqx, yqy, yqz)
            rx, ry, rz = _qlog(lw, lx, ly, lz)
            gw, gx, gy, gz = _qexp(
                jnp.sum(rx, axis=0, keepdims=True) * inv_n,
                jnp.sum(ry, axis=0, keepdims=True) * inv_n,
                jnp.sum(rz, axis=0, keepdims=True) * inv_n,
            )
            mw, mx, my, mz = _qnorm4(*_qmul(mw, mx, my, mz, gw, gx, gy, gz))
        muo_ref[0:3] = mean_pos
        muo_ref[3:4] = mw
        muo_ref[4:5] = mx
        muo_ref[5:6] = my
        muo_ref[6:7] = mz
        muo_ref[7:54] = mean_flat

        # phase D
        lw, lx, ly, lz = _qmul(mw, -mx, -my, -mz, yqw, yqx, yqy, yqz)
        rx, ry, rz = _qlog(lw, lx, ly, lz)
        y_ref[:, 0:3] = y_ref[:, 0:3] - mean_pos[None]
        y_ref[:, 6:53] = y_ref[:, 7:54] - mean_flat[None]
        y_ref[:, 3] = rx
        y_ref[:, 4] = ry
        y_ref[:, 5] = rz
        if phases == "ABCD":
            cov_ref[0] = jnp.sum(y_ref[:, 0:53], axis=0)
            return

        # phase E (no Q assembly — banked-style raw reconstruction)
        if full_row_e:
            for nn in range(TANGENT_DIM):
                acc = None
                for lo, hi in ((0, 54), (54, NSIG)):
                    part = jnp.sum(
                        y_ref[lo:hi, 0:53] * y_ref[lo:hi, nn, :][:, None, :], axis=0
                    )
                    acc = part if acc is None else acc + part
                cov_ref[nn] = 0.5 * acc
        else:
            for nn in range(TANGENT_DIM):
                acc = None
                for lo, hi in ((0, 54), (54, NSIG)):
                    part = jnp.sum(
                        y_ref[lo:hi, nn:53] * y_ref[lo:hi, nn, :][:, None, :], axis=0
                    )
                    acc = part if acc is None else acc + part
                cov_ref[nn, nn:53] = 0.5 * acc

    return body



def make_streaming_body(mean_iters: int = MEAN_ITERS):
    """Prototype: no y-delta materialization. The factorization keeps
    finalized equilibrated columns (incl. diagonal, zero head) in s_ref;
    phase B reads +/- slabs straight from s_ref and writes propagated points
    into y_ref in block order (0, +1..53, -1..53)."""

    def body(a_ref, mu_ref, rr_ref, coeff_ref, offs_ref, q0m_ref, scal_ref,
             cov_ref, muo_ref, y_ref, c_ref):
        n = TANGENT_DIM
        b = a_ref.shape[-1]
        f1 = lambda i: scal_ref[i, 0]
        dt = f1(_S_DT)
        mu = mu_ref[:]

        # ---- phase A': equilibrated Cholesky, columns persisted in c_ref ---
        row = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
        tiny = jnp.asarray(jnp.finfo(a_ref.dtype).tiny, a_ref.dtype)
        diag = jnp.concatenate([a_ref[j, j:j+1, :] for j in range(n)], axis=0)
        dvec = jnp.sqrt(jnp.maximum(diag, tiny))
        dinv = 1.0 / dvec
        for j in range(n):
            rs = (j // 8) * 8
            c_ref[j, rs:] = a_ref[j, rs:] * (dinv[j:j+1, :] * dinv[rs:])
        for jb in range(0, n, 16):
            je = min(jb + 16, n)
            rowt = row[jb:]
            for j in range(jb, je):
                colt = c_ref[j, jb:]
                for jj in range(jb, j):
                    bt = c_ref[jj, jb:]
                    colt = colt - bt[j - jb: j - jb + 1] * bt
                dj = jnp.sqrt(colt[j - jb: j - jb + 1])
                belowt = jnp.where(rowt > j, colt * (1.0 / dj), jnp.zeros((), colt.dtype))
                keep = jnp.where(rowt == j, dj, belowt)  # diag keeps dj
                if jb:
                    c_ref[j] = jnp.concatenate(
                        [jnp.zeros((jb, b), keep.dtype), keep], axis=0)
                else:
                    c_ref[j] = keep
            if je < n:
                cut = je - jb
                upd = None
                for jj in range(jb, je):
                    bt = c_ref[jj, jb:]
                    # rows >= je are strictly below diag: diag entry not read
                    term = bt[cut:][:, None, :] * bt[cut:][None, :, :]
                    upd = term if upd is None else upd + term
                c_ref[je:, je:] = c_ref[je:, je:] - upd

        # ---- phase B': process model on +/- slabs read from c_ref ----------
        coeff = coeff_ref[:]
        offs = offs_ref[:]
        rr = rr_ref[:]
        dsc = dvec  # (53, B) un-equilibration row scale

        def propagate(d_pos, d_rot, d_flat, lo, hi):
            # d_pos (k,3,B), d_rot 3x(k,B), d_flat (k,47,B) tangent deltas
            x_pos = mu[0:3][None] + d_pos
            x_flat = mu[7:54][None] + d_flat
            ew, ex, ey, ez = _qexp(*d_rot)
            qw, qx, qy, qz = _qmul(mu[3:4], mu[4:5], mu[5:6], mu[6:7], ew, ex, ey, ez)
            qw, qx, qy, qz = _qnorm4(qw, qx, qy, qz)
            x_vel = x_flat[:, 0:3]
            x_acc = x_flat[:, 3:6]
            y_pos = x_pos + dt * x_vel
            lat = f1(_S_LAT0) + x_pos[:, 0] * f1(_S_MRADINV)
            er_x = f1(_S_EARTHW) * jnp.cos(lat)
            er_z = f1(_S_EARTHW) * jnp.sin(lat)
            vx = rr[0:1] - x_flat[:, 6]
            vy = rr[1:2] - x_flat[:, 7]
            vz = rr[2:3] - x_flat[:, 8]
            tx = 2.0 * (qy * vz - qz * vy)
            ty = 2.0 * (qz * vx - qx * vz)
            tz = 2.0 * (qx * vy - qy * vx)
            wx = vx + qw * tx + (qy * tz - qz * ty) - er_x
            wy = vy + qw * ty + (qz * tx - qx * tz)
            wz = vz + qw * tz + (qx * ty - qy * tx) - er_z
            gw, gx, gy, gz = _qexp(wx * dt, wy * dt, wz * dt)
            yqw, yqx, yqy, yqz = _qnorm4(*_qmul(qw, qx, qy, qz, gw, gx, gy, gz))
            y_flat = x_flat + coeff[7:54][None] * (x_flat - offs[7:54][None])
            y_ref[lo:hi, 7:10] = x_vel + dt * x_acc
            y_ref[lo:hi, 10:54] = y_flat[:, 3:]
            y_ref[lo:hi, 0:3] = y_pos
            y_ref[lo:hi, 3] = yqw
            y_ref[lo:hi, 4] = yqx
            y_ref[lo:hi, 5] = yqy
            y_ref[lo:hi, 6] = yqz

        zero3 = jnp.zeros((1, b), mu.dtype)
        propagate(jnp.zeros((1, 3, b), mu.dtype), (zero3, zero3, zero3),
                  jnp.zeros((1, 47, b), mu.dtype), 0, 1)
        dsc_pos = jnp.reshape(dsc[0:3], (1, 3, b))
        dsc_flat = jnp.reshape(dsc[6:53], (1, 47, b))
        for sign, lo, hi in ((1.0, 1, 54), (-1.0, 54, NSIG)):
            d_pos = sign * c_ref[:, 0:3] * dsc_pos
            d_rot = (sign * c_ref[:, 3] * dsc[3:4], sign * c_ref[:, 4] * dsc[4:5],
                     sign * c_ref[:, 5] * dsc[5:6])
            d_flat = sign * c_ref[:, 6:53] * dsc_flat
            propagate(d_pos, d_rot, d_flat, lo, hi)

        # ---- phases C/D/E exactly as production ---------------------------
        inv_n = 1.0 / NSIG
        mean_flat = jnp.sum(y_ref[:, 7:54], axis=0) * inv_n
        mean_pos = jnp.sum(y_ref[:, 0:3], axis=0) * inv_n
        yqw = y_ref[:, 3, :]
        yqx = y_ref[:, 4, :]
        yqy = y_ref[:, 5, :]
        yqz = y_ref[:, 6, :]
        mw, mx, my, mz = yqw[0:1], yqx[0:1], yqy[0:1], yqz[0:1]
        for _ in range(mean_iters):
            lw, lx, ly, lz = _qmul(mw, -mx, -my, -mz, yqw, yqx, yqy, yqz)
            rx, ry, rz = _qlog(lw, lx, ly, lz)
            gw, gx, gy, gz = _qexp(
                jnp.sum(rx, axis=0, keepdims=True) * inv_n,
                jnp.sum(ry, axis=0, keepdims=True) * inv_n,
                jnp.sum(rz, axis=0, keepdims=True) * inv_n,
            )
            mw, mx, my, mz = _qnorm4(*_qmul(mw, mx, my, mz, gw, gx, gy, gz))
        muo_ref[0:3] = mean_pos
        muo_ref[3:4] = mw
        muo_ref[4:5] = mx
        muo_ref[5:6] = my
        muo_ref[6:7] = mz
        muo_ref[7:54] = mean_flat
        lw, lx, ly, lz = _qmul(mw, -mx, -my, -mz, yqw, yqx, yqy, yqz)
        rx, ry, rz = _qlog(lw, lx, ly, lz)
        y_ref[:, 0:3] = y_ref[:, 0:3] - mean_pos[None]
        y_ref[:, 6:53] = y_ref[:, 7:54] - mean_flat[None]
        y_ref[:, 3] = rx
        y_ref[:, 4] = ry
        y_ref[:, 5] = rz
        for nn in range(TANGENT_DIM):
            acc = None
            for lo, hi in ((0, 54), (54, NSIG)):
                part = jnp.sum(
                    y_ref[lo:hi, nn:53] * y_ref[lo:hi, nn, :][:, None, :], axis=0
                )
                acc = part if acc is None else acc + part
            cov_ref[nn, nn:53] = 0.5 * acc

    return body



def make_bulk_body(mean_iters: int = MEAN_ITERS):
    """Keep-columns Cholesky into c_ref, then TWO bulk statements write the
    +/- delta slabs into y_ref (block sigma order); phases B-E unchanged."""

    def body(a_ref, mu_ref, rr_ref, coeff_ref, offs_ref, q0m_ref, scal_ref,
             cov_ref, muo_ref, y_ref, c_ref):
        n = TANGENT_DIM
        b = a_ref.shape[-1]
        f1 = lambda i: scal_ref[i, 0]
        dt = f1(_S_DT)
        mu = mu_ref[:]

        # ---- phase A'': keep-columns equilibrated Cholesky -----------------
        row = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
        tiny = jnp.asarray(jnp.finfo(a_ref.dtype).tiny, a_ref.dtype)
        diag = jnp.concatenate([a_ref[j, j:j+1, :] for j in range(n)], axis=0)
        dvec = jnp.sqrt(jnp.maximum(diag, tiny))
        dinv = 1.0 / dvec
        for j in range(n):
            rs = (j // 8) * 8
            c_ref[j, rs:] = a_ref[j, rs:] * (dinv[j:j+1, :] * dinv[rs:])
        for jb in range(0, n, 16):
            je = min(jb + 16, n)
            rowt = row[jb:]
            for j in range(jb, je):
                colt = c_ref[j, jb:]
                for jj in range(jb, j):
                    bt = c_ref[jj, jb:]
                    colt = colt - bt[j - jb: j - jb + 1] * bt
                dj = jnp.sqrt(colt[j - jb: j - jb + 1])
                belowt = jnp.where(rowt > j, colt * (1.0 / dj), jnp.zeros((), colt.dtype))
                keep = jnp.where(rowt == j, dj, belowt)
                if jb:
                    c_ref[j] = jnp.concatenate(
                        [jnp.zeros((jb, b), keep.dtype), keep], axis=0)
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

        # ---- bulk +/- delta emission (2 big statements) --------------------
        dscb = jnp.reshape(dvec, (1, n, b))
        pos = c_ref[:] * dscb  # (53, 53, B) un-equilibrated columns
        y_ref[0, 0:53] = jnp.zeros((n, b), mu.dtype)
        y_ref[1:54, 0:53] = pos
        y_ref[54:NSIG, 0:53] = -pos

        # ---- phases B-E exactly as production (block sigma order) ----------
        coeff = coeff_ref[:]
        offs = offs_ref[:]
        rr = rr_ref[:]
        for lo, hi in ((0, 54), (54, NSIG)):
            d = y_ref[lo:hi, 0:53]
            x_pos = mu[0:3][None] + d[:, 0:3]
            x_flat = mu[7:54][None] + d[:, 6:53]
            ew, ex, ey, ez = _qexp(d[:, 3], d[:, 4], d[:, 5])
            qw, qx, qy, qz = _qmul(mu[3:4], mu[4:5], mu[5:6], mu[6:7], ew, ex, ey, ez)
            qw, qx, qy, qz = _qnorm4(qw, qx, qy, qz)
            x_vel = x_flat[:, 0:3]
            x_acc = x_flat[:, 3:6]
            y_pos = x_pos + dt * x_vel
            lat = f1(_S_LAT0) + x_pos[:, 0] * f1(_S_MRADINV)
            er_x = f1(_S_EARTHW) * jnp.cos(lat)
            er_z = f1(_S_EARTHW) * jnp.sin(lat)
            vx = rr[0:1] - x_flat[:, 6]
            vy = rr[1:2] - x_flat[:, 7]
            vz = rr[2:3] - x_flat[:, 8]
            tx = 2.0 * (qy * vz - qz * vy)
            ty = 2.0 * (qz * vx - qx * vz)
            tz = 2.0 * (qx * vy - qy * vx)
            wx = vx + qw * tx + (qy * tz - qz * ty) - er_x
            wy = vy + qw * ty + (qz * tx - qx * tz)
            wz = vz + qw * tz + (qx * ty - qy * tx) - er_z
            gw, gx, gy, gz = _qexp(wx * dt, wy * dt, wz * dt)
            yqw, yqx, yqy, yqz = _qnorm4(*_qmul(qw, qx, qy, qz, gw, gx, gy, gz))
            y_flat = x_flat + coeff[7:54][None] * (x_flat - offs[7:54][None])
            y_ref[lo:hi, 7:10] = x_vel + dt * x_acc
            y_ref[lo:hi, 10:54] = y_flat[:, 3:]
            y_ref[lo:hi, 0:3] = y_pos
            y_ref[lo:hi, 3] = yqw
            y_ref[lo:hi, 4] = yqx
            y_ref[lo:hi, 5] = yqy
            y_ref[lo:hi, 6] = yqz
        inv_n = 1.0 / NSIG
        mean_flat = jnp.sum(y_ref[:, 7:54], axis=0) * inv_n
        mean_pos = jnp.sum(y_ref[:, 0:3], axis=0) * inv_n
        yqw = y_ref[:, 3, :]
        yqx = y_ref[:, 4, :]
        yqy = y_ref[:, 5, :]
        yqz = y_ref[:, 6, :]
        mw, mx, my, mz = yqw[0:1], yqx[0:1], yqy[0:1], yqz[0:1]
        for _ in range(mean_iters):
            lw, lx, ly, lz = _qmul(mw, -mx, -my, -mz, yqw, yqx, yqy, yqz)
            rx, ry, rz = _qlog(lw, lx, ly, lz)
            gw, gx, gy, gz = _qexp(
                jnp.sum(rx, axis=0, keepdims=True) * inv_n,
                jnp.sum(ry, axis=0, keepdims=True) * inv_n,
                jnp.sum(rz, axis=0, keepdims=True) * inv_n,
            )
            mw, mx, my, mz = _qnorm4(*_qmul(mw, mx, my, mz, gw, gx, gy, gz))
        muo_ref[0:3] = mean_pos
        muo_ref[3:4] = mw
        muo_ref[4:5] = mx
        muo_ref[5:6] = my
        muo_ref[6:7] = mz
        muo_ref[7:54] = mean_flat
        lw, lx, ly, lz = _qmul(mw, -mx, -my, -mz, yqw, yqx, yqy, yqz)
        rx, ry, rz = _qlog(lw, lx, ly, lz)
        y_ref[:, 0:3] = y_ref[:, 0:3] - mean_pos[None]
        y_ref[:, 6:53] = y_ref[:, 7:54] - mean_flat[None]
        y_ref[:, 3] = rx
        y_ref[:, 4] = ry
        y_ref[:, 5] = rz
        for nn in range(TANGENT_DIM):
            acc = None
            for lo, hi in ((0, 54), (54, NSIG)):
                part = jnp.sum(
                    y_ref[lo:hi, nn:53] * y_ref[lo:hi, nn, :][:, None, :], axis=0
                )
                acc = part if acc is None else acc + part
            cov_ref[nn, nn:53] = 0.5 * acc

    return body


def run_variant(name, body, cov_t, mu_t, rr_t, coeff, offs, q0m, scal, iters=30):
    n = TANGENT_DIM
    nb = cov_t.shape[-1]
    lane_spec = kernels.lane_block_spec
    full_spec = kernels.full_block_spec

    def launch(cov_t):
        return pl.pallas_call(
            body,
            out_shape=(
                jax.ShapeDtypeStruct((n, n, nb), cov_t.dtype),
                jax.ShapeDtypeStruct((STORAGE_DIM, nb), cov_t.dtype),
            ),
            grid=(nb // LANE_TILE,),
            in_specs=[
                lane_spec(n, n),
                lane_spec(STORAGE_DIM),
                lane_spec(3),
                full_spec(STORAGE_DIM, 1),
                full_spec(STORAGE_DIM, 1),
                full_spec(n, n, 1),
                pl.BlockSpec((_NSCAL, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=(lane_spec(n, n), lane_spec(STORAGE_DIM)),
            scratch_shapes=[
                pltpu.VMEM((NSIG, STORAGE_DIM, LANE_TILE), cov_t.dtype),
                pltpu.VMEM((n, n, LANE_TILE), cov_t.dtype),
            ],
            interpret=False,
        )(cov_t, mu_t, rr_t, coeff, offs, q0m, scal)

    # chain on cov via tiny scalar feedback to serialize without host syncs
    def step(c):
        co, mo = launch(c)
        return c + jnp.tanh(mo[0, 0]) * jnp.float32(1e-20) + 0.0 * co[0, 0, 0]

    jfn = jax.jit(step)
    c = jax.block_until_ready(jfn(cov_t))
    t0 = time.perf_counter()
    for _ in range(iters):
        c = jfn(c)
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.3f} ms")
    return dt


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
    cov_t = ls.cov_t
    mu_t = ls.mu_t
    rr_t = ls.rr_t if hasattr(ls, "rr_t") else jnp.zeros((3, NB), dtype)
    coeff = jnp.zeros((STORAGE_DIM, 1), dtype)
    offs = jnp.zeros((STORAGE_DIM, 1), dtype)
    q0m = jnp.zeros((TANGENT_DIM, TANGENT_DIM, 1), dtype)
    scal = jnp.zeros((_NSCAL, 1), dtype).at[_S_DT, 0].set(0.01)

    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    table = {
        "A": ("A only", make_body("A")),
        "AB": ("A+B", make_body("AB")),
        "ABCD": ("A+B+C+D", make_body("ABCD")),
        "full": ("full (tri E)", make_body("ABCDE")),
        "rowE": ("full (row E)", make_body("ABCDE", full_row_e=True)),
        "mi2": ("full, mean_iters=2", make_body("ABCDE", mean_iters=2)),
        "factor": ("full, factor input (no chol)", make_body("ABCDE", factor_input="plain")),
        "factorA": ("A only, factor plain", make_body("A", factor_input="plain")),
        "factorW": ("A only, factor wide", make_body("A", factor_input="wide")),
        "factorP": ("A only, factor pair", make_body("A", factor_input="pair")),
        "factorB": ("A only, factor block8", make_body("A", factor_input="block")),
        "stream": ("full, streaming A/B from c_ref", make_streaming_body()),
        "bulk": ("full, bulk +/- emission", make_bulk_body()),
    }
    keys = list(table) if which == "all" else which.split(",")
    for k in keys:
        name, body = table[k]
        run_variant(name, body, cov_t, mu_t, rr_t, coeff, offs, q0m, scal)


if __name__ == "__main__":
    main()
