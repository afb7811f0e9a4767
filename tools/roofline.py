"""Empirical roofline for the fused PoseUKF mission tick on this chip.

Measures the three hardware ceilings that bound the pose_full bench
(docs/TUNING.md "Roofline" section is generated from this script's output):

1. HBM bandwidth — a jitted streaming triad over a ~1 GiB f32 array.
2. VPU f32 FMA throughput — a Pallas kernel holding a (8, 512, 128) block in
   VMEM and running a long unrolled multiply-add chain; the fused filter
   kernels are VPU code (bank on lanes, sigma axis on sublanes), so THIS is
   their compute ceiling, not the MXU number.
3. MXU matmul throughput — 4096³ `jnp.dot` at bf16-input, f32 default
   (3-pass) and HIGHEST (6-pass) precisions, for context on what the filter
   deliberately does not use (53-DOF per-instance algebra does not tile onto
   a 128x128 systolic array without transposing the bank off the lane axis).

It also counts the *algorithmic* FLOPs of one full mission tick by running
XLA's cost analysis over the unfused (generic vmap) lowering of the same
bench schedule on CPU — the Pallas kernels are opaque custom calls to the
cost model, the generic lowering of identical math is not.

Run on the TPU host:  python tools/roofline.py
(CPU fallback works but only the FLOP count is meaningful there.)
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _log(*a):
    print(*a, file=sys.stderr)


def _time_best(fn, iters, repeats=5):
    fn()  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def measure_hbm_bw():
    """Streaming triad y = a*x + y: 3 HBM transfers (2 reads + 1 write) of a
    256 Mi-element f32 array per call."""
    n = 256 * 1024 * 1024
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.ones((n,), jnp.float32)
    triad = jax.jit(lambda x, y: 1.5 * x + y)
    jax.block_until_ready(triad(x, y))
    dt = _time_best(lambda: triad(x, y), iters=4)
    return 3 * 4 * n / dt  # bytes/s


def measure_vpu_fma():
    """Long FMA chain on a VMEM-resident (8, 512, 128) f32 block: 2 flops per
    element per chain step, 512 steps, tiny HBM traffic -> pure VPU rate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHAIN = 512
    shape = (8, 512, 128)

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = a
        for _ in range(CHAIN):
            acc = acc * b + a
        o_ref[:] = acc

    grid = (64,)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    )
    a = jnp.full(shape, 1.0000001, jnp.float32)
    b = jnp.full(shape, 0.9999999, jnp.float32)
    f = jax.jit(lambda a, b: call(a, b))
    jax.block_until_ready(f(a, b))
    dt = _time_best(lambda: f(a, b), iters=8)
    flops = 2 * CHAIN * np.prod(shape) * grid[0]
    return flops / dt


def measure_mxu(precision, dtype=jnp.float32):
    n = 4096
    a = jnp.ones((n, n), dtype)
    b = jnp.ones((n, n), dtype)
    f = jax.jit(functools.partial(jnp.dot, precision=precision))
    jax.block_until_ready(f(a, b))
    dt = _time_best(lambda: f(a, b), iters=8)
    return 2 * n**3 / dt


def count_tick_flops(bank=512):
    """Algorithmic FLOPs of one pose_full mission tick (the 100-tick second /
    100), from XLA cost analysis of the generic (unfused, vmapped) lowering
    on CPU. Uses the exact bench schedule from bench.py."""
    cpu = jax.devices("cpu")[0]
    import bench
    from slam_uwv_kalman_filters_tpu.models import pose_ukf as pukf
    from slam_uwv_kalman_filters_tpu.parallel import bank as bankmod

    with jax.default_device(cpu):
        state, params, ms = bench._pose_full_setup(jnp.float32)
        bstate = bankmod.replicate(state, bank)
        bc = lambda a: jnp.broadcast_to(a, (bank, *a.shape))

        def super_tick(bs):
            bs = bs._replace(rotation_rate=bc(ms["gyro"]))
            for k in range(bench.FULL_TICKS):
                bs = pukf.predict_bank(bs, params, 0.01)
                bs, _ = pukf.update_acceleration_bank(bs, params, bc(ms["acc"]), ms["acc_cov"])
                if bench._DVL_AT(k):
                    bs, _ = pukf.update_velocity_bank(bs, params, bc(ms["dvl"]), ms["dvl_cov"])
                if bench._PRESS_AT(k):
                    bs, _ = pukf.update_pressure_bank(bs, params, bc(ms["press"]), ms["press_cov"])
                if bench._ADCP_AT(k):
                    bs, _ = pukf.update_water_velocity_bank(
                        bs, params, bc(ms["adcp"]), ms["adcp_cov"], 0.5
                    )
                if bench._EFF_AT(k):
                    rr = pukf.get_rotation_rate_bank(bs, params)
                    bs, _ = pukf.update_body_efforts_bank(
                        bs, params, bc(ms["eff"]), ms["eff_cov"], rr
                    )
            return bs

        lowered = jax.jit(super_tick).lower(bstate)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    return flops / (bank * bench.FULL_TICKS)


def main():
    backend = jax.default_backend()
    out = {"backend": backend}

    _log("counting algorithmic flops/tick (CPU cost analysis, unfused lowering)…")
    out["flops_per_tick_algorithmic"] = count_tick_flops()
    _log(f"  flops/tick = {out['flops_per_tick_algorithmic']:.3e}")

    if backend != "cpu":
        _log("measuring HBM triad bandwidth…")
        out["hbm_bw_bytes_per_s"] = measure_hbm_bw()
        _log(f"  {out['hbm_bw_bytes_per_s']/1e9:.0f} GB/s")

        _log("measuring VPU f32 FMA throughput…")
        out["vpu_f32_flops_per_s"] = measure_vpu_fma()
        _log(f"  {out['vpu_f32_flops_per_s']/1e12:.2f} TFLOP/s")

        _log("measuring MXU matmul throughput…")
        out["mxu_f32_default_flops_per_s"] = measure_mxu(jax.lax.Precision.DEFAULT)
        out["mxu_f32_highest_flops_per_s"] = measure_mxu(jax.lax.Precision.HIGHEST)
        out["mxu_bf16_flops_per_s"] = measure_mxu(
            jax.lax.Precision.DEFAULT, dtype=jnp.bfloat16
        )
        _log(
            f"  f32-default {out['mxu_f32_default_flops_per_s']/1e12:.0f}, "
            f"f32-highest {out['mxu_f32_highest_flops_per_s']/1e12:.0f}, "
            f"bf16 {out['mxu_bf16_flops_per_s']/1e12:.0f} TFLOP/s"
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
