"""Measure this chip's ACHIEVABLE ceilings for the roofline model's units
(real TPU): MXU GEMM TFLOP/s (default + highest precision), HBM stream
bandwidth, fused-elementwise VPU FLOP/s, and counter-RNG normal/s.

The analytic cost models in utils/profiling charge each kernel at a unit
peak; datasheet peaks overstate what the remote-compiled binaries reach,
which deflates every roofline fraction. This probe measures the ceilings
with the same serialized-step methodology as bench.py, AMORTIZING the
~1.4 ms dispatch floor with a dependent inner repeat chain (R dependent
ops per step), and writes results/machine_peaks.json, which
utils/profiling loads (committed artifact) in preference to the built-in
estimates.

Usage: python tools/measure_peaks.py
"""
import os
import sys
import json
import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _time_steps, _key

R = 8   # dependent inner repeats per step (amortizes the dispatch floor)


def measure_gemm(n=4096, precision=None):
    """f32-in GEMM chain at the given precision; returns achieved
    TFLOP/s. The chain feeds each GEMM's (rescaled) output into the next
    so the R repeats cannot overlap or fold."""
    a = jax.random.normal(_key(1), (n, n), jnp.float32) / np.sqrt(n)
    b = jax.random.normal(_key(2), (n, n), jnp.float32) / np.sqrt(n)

    def step(key):
        s = 1.0 + 0.0 * jax.random.uniform(key, ())
        acc = a * s
        for _ in range(R):
            acc = jnp.matmul(acc, b, precision=precision,
                             preferred_element_type=jnp.float32)
        return jnp.sum(acc)

    dt = _time_steps(step, _key(0), n_steps=10, n_rolls=2)
    return 2.0 * n ** 3 * R / dt / 1e12


def _iota_f32(n):
    """Deterministic on-device array behind an optimization barrier —
    never a baked-in program constant (a closure-captured 512 MB array
    ships to the remote-compile service and trips its body-size limit),
    never folded into the consumer."""
    x = (jnp.arange(n, dtype=jnp.float32) % 97.0) * np.float32(0.01)
    return jax.lax.optimization_barrier(x)


def measure_hbm(mb=512):
    """R dependent streaming passes y <- a·y + c over an f32 array;
    returns achieved GB/s (read + write per pass)."""
    n = mb * 1024 * 1024 // 4

    def step(key):
        s = 1.0 + 0.0 * jax.random.uniform(key, ())
        acc = _iota_f32(n) * s
        for i in range(R):
            # rotate by one element to force a genuine new pass
            acc = jnp.roll(acc, 1) * np.float32(0.999) + np.float32(0.001)
        return jnp.sum(acc)

    dt = _time_steps(step, _key(0), n_steps=10, n_rolls=2)
    return R * 2.0 * 4.0 * n / dt / 1e9


def measure_vpu(mb=64, degree=256):
    """Degree-`degree` Horner polynomial over an f32 array (arithmetic
    intensity degree/2 flops/byte -> compute-bound); returns achieved
    GFLOP/s of fused elementwise FMA work."""
    n = mb * 1024 * 1024 // 4

    def step(key):
        s = 1.0 + 0.0 * jax.random.uniform(key, ())
        x = _iota_f32(n) * np.float32(0.05)
        acc = x * s
        for i in range(degree):
            acc = acc * x + np.float32(1.0 / (i + 2))
        return jnp.sum(acc)

    dt = _time_steps(step, _key(0), n_steps=10, n_rolls=2)
    return 2.0 * degree * n / dt / 1e9


def measure_rng(m=512):
    """Counter-based normal generation rate; returns Gnormals/s."""
    n = m * 1024 * 1024

    def step(key):
        return jnp.sum(jax.random.normal(key, (n,), jnp.float32))

    dt = _time_steps(step, _key(0), n_steps=5, n_rolls=2)
    return n / dt / 1e9


def main():
    out = {"measured": datetime.date.today().isoformat(),
           "method": f"serialized-step best-of-2 checksum-agreeing "
                     f"compiles, {R} dependent inner repeats/step "
                     f"(bench._time_steps)"}
    out["gemm_default_tflops"] = round(measure_gemm(
        precision=jax.lax.Precision.DEFAULT), 1)
    print("gemm default:", out["gemm_default_tflops"], "TFLOP/s", flush=True)
    out["gemm_highest_tflops"] = round(measure_gemm(
        precision=jax.lax.Precision.HIGHEST), 1)
    print("gemm highest:", out["gemm_highest_tflops"], "TFLOP/s", flush=True)
    out["hbm_stream_gbs"] = round(measure_hbm(), 1)
    print("hbm stream:", out["hbm_stream_gbs"], "GB/s", flush=True)
    out["vpu_fused_gflops"] = round(measure_vpu(), 1)
    print("vpu fused:", out["vpu_fused_gflops"], "GFLOP/s", flush=True)
    out["rng_gnormals_s"] = round(measure_rng(), 2)
    print("rng:", out["rng_gnormals_s"], "Gnormals/s", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "machine_peaks.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("saved", path, flush=True)


if __name__ == "__main__":
    main()
