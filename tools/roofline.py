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
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _log(*a):
    print(*a, file=sys.stderr)


def _time_best_chained(step, carry, iters, repeats=5):
    """Time ``carry = step(carry, t)`` chains, synchronized by a one-element
    host readback. Three axon-backend hazards shape this helper: (1)
    ``jax.block_until_ready`` returns immediately (a 768 MB triad "completes"
    in 0.12 ms under it), so only a host read is a true barrier; (2) the
    runtime serves repeated executions with identical args from a cache, so
    the carry chains call-to-call AND a host-fresh scalar ``t`` rides along
    (chaining alone fails when the value iteration converges to a fixpoint —
    bf16 rounding collapsed one variant and it "measured" 3x hardware peak);
    (3) per-dispatch latency is ~ms, so callers amortize with a device-side
    fori_loop. The readback round-trip is measured separately and
    subtracted."""
    probe = jax.jit(lambda a: a.reshape(-1)[0])
    probe(carry).item()  # compile probe
    carry = step(carry, 0.0)  # compile step
    probe(carry).item()
    # readback round-trip on an already-materialized carry
    t0 = time.perf_counter()
    probe(carry).item()
    rtt = time.perf_counter() - t0
    best = float("inf")
    t = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            t += 1e-6
            carry = step(carry, t)
        probe(carry).item()
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    return max(best, 1e-12)


K_INNER = 32  # device-side work iterations per dispatch (lax.fori_loop):
# one RPC dispatch amortized over K full passes — per-call dispatch latency
# (~ms through the tunnel) would otherwise rival the device time of a single
# pass. XLA cannot fuse across fori_loop iterations, so each one is a real
# HBM round trip / kernel launch.


def measure_hbm_bw():
    """Streaming triad y <- c*x + y iterated K_INNER times per dispatch:
    3 HBM transfers (2 reads + 1 write) of a 256 Mi-element f32 array per
    iteration; y chains call-to-call."""
    n = 256 * 1024 * 1024
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9
    y = jnp.ones((n,), jnp.float32)

    # x rides as an argument (a closure constant this size gets baked into
    # the remote-compile payload and rejected with HTTP 413); the host-fresh
    # t folds into the multiplier, costing no extra traffic
    @jax.jit
    def triad(x, y, t):
        return jax.lax.fori_loop(0, K_INNER, lambda i, c: (1.000001 + t) * x + c, y)

    dt = _time_best_chained(lambda c, t: triad(x, c, t), y, iters=3)
    return 3 * 4 * n * K_INNER / dt  # bytes/s


def measure_vpu_fma(dtype=jnp.float32):
    """Long FMA chain on a VMEM-resident (8, 512, 128) block: 2 flops per
    element per chain step, 512 steps, tiny HBM traffic -> pure VPU rate.
    The a-operand chains call-to-call so every launch is unique. The bf16
    variant answers whether a half-precision phase-E experiment in the fused
    filter kernels could pay (it only can if the VPU runs bf16 FMAs at 2x)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHAIN = 512
    shape = (8, 512, 128)

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        # four independent accumulator chains expose ILP — a single
        # dependent chain measures FMA latency, not throughput
        a0, a1, a2, a3 = a, a + 1.0, a + 2.0, a + 3.0
        for _ in range(CHAIN // 4):
            a0 = a0 * b + a
            a1 = a1 * b + a
            a2 = a2 * b + a
            a3 = a3 * b + a
        o_ref[:] = (a0 + a1 + a2 + a3) * 1e-3  # keep the chained carry bounded

    grid = (64,)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    )
    a = jnp.full(shape, 1.0000001, dtype)
    b = jnp.full(shape, 0.9999999, dtype)

    @jax.jit
    def f(a, b, t):
        return jax.lax.fori_loop(0, K_INNER, lambda i, c: call(c, b + t), a)

    dt = _time_best_chained(lambda c, t: f(c, b, jnp.asarray(t, dtype)), a, iters=3)
    flops = 2 * CHAIN * np.prod(shape) * grid[0] * K_INNER
    return flops / dt


def measure_mxu(precision, dtype=jnp.float32):
    """4096³ matmul, K_INNER per dispatch, with a chained value-varying
    carry. The carry must hold DIFFERENT values every iteration: any carry
    that converges to a fixpoint (all-ones with rescale; mean-field collapse
    of a near-uniform operand under bf16 rounding) gets served from the
    runtime's execution cache ("595 TFLOP/s bf16" on a ~200-peak part).
    A Ginibre operand a ~ N(0,1)/sqrt(n) mixes chaotically with spectral
    radius ~1, so b never converges and its norm drifts only slowly."""
    n = 4096
    a = (jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32) / np.sqrt(n)).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32).astype(dtype)
    dot = functools.partial(jnp.dot, precision=precision)

    @jax.jit
    def f(a, b, t):
        return jax.lax.fori_loop(0, K_INNER, lambda i, c: dot(a, c), b) + t

    dt = _time_best_chained(lambda c, t: f(a, c, jnp.asarray(t, dtype)), b, iters=3)
    return 2 * n**3 * K_INNER / dt


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

    pre = os.environ.get("ROOFLINE_FLOPS_PER_TICK")
    if pre:
        # reuse a previously measured count (the CPU cost-analysis compile of
        # the 100-tick program takes ~5 min on this host)
        out["flops_per_tick_algorithmic"] = float(pre)
    else:
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

        _log("measuring VPU bf16 FMA throughput…")
        out["vpu_bf16_flops_per_s"] = measure_vpu_fma(jnp.bfloat16)
        _log(f"  {out['vpu_bf16_flops_per_s']/1e12:.2f} TFLOP/s")

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
