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


def measure_cmatmul_modem(precision_name, shapes=None):
    """Effective complex-matmul ceiling AT THE MODEM'S SHAPES through the
    repo's own cmatmul path (ofdm_lte_tpu.cplx.matmul under the
    OFDM_LTE_TPU_MATMUL_PRECISION policy) — the r4 verdict's calibration
    gap: the 4096x4096 mono-GEMM ceiling under- or over-states what the
    policy's decomposition reaches on the modem's skinny (S, nd)x(nd, sps)
    products (measured 'highest' 29.2 TF at 4096² vs ~85 TF effective in
    the SISO program). Returns effective TFLOP/s in the 8·m·k·n
    convention (4-real-matmul complex flop count — the cost models charge
    the same convention, so fraction math is internally consistent).
    Takes the BEST across the headline shapes (a ceiling is a max)."""
    from ofdm_lte_tpu import cplx
    from ofdm_lte_tpu.precision import matmul_precision

    if shapes is None:
        # 20 MHz SISO headline: fused TX scatter+IDFT+CP (S=256·14 rows),
        # RX data DFT; and the 10 MHz diversity shapes
        shapes = [(3584, 999, 2192), (3584, 2048, 999),
                  (7168, 498, 1096), (7168, 1024, 498)]

    prev = os.environ.get("OFDM_LTE_TPU_MATMUL_PRECISION")
    os.environ["OFDM_LTE_TPU_MATMUL_PRECISION"] = precision_name
    jax.clear_caches()
    best = 0.0
    per_shape = {}
    try:
        for (m, k, n) in shapes:
            a = cplx.C(jax.random.normal(_key(3), (m, k), jnp.float32)
                       / np.sqrt(k),
                       jax.random.normal(_key(4), (m, k), jnp.float32)
                       / np.sqrt(k))
            b = cplx.C(jax.random.normal(_key(5), (k, n), jnp.float32)
                       / np.sqrt(k),
                       jax.random.normal(_key(6), (k, n), jnp.float32)
                       / np.sqrt(k))
            bt = cplx.C(b.re.T, b.im.T)

            def step(key, a=a, b=b, bt=bt, m=m, k=k, n=n):
                s = 1.0 + 0.0 * jax.random.uniform(key, ())
                acc = cplx.C(a.re * s, a.im)
                reps = max(1, R // 2)
                c = None
                for _ in range(reps):
                    c = cplx.matmul(acc, b,
                                    precision=matmul_precision())  # (m, n)
                    # chain back to (m, k) so the repeats stay dependent
                    acc = cplx.matmul(c, bt,
                                      precision=matmul_precision())
                return jnp.sum(c.re) + jnp.sum(c.im)

            dt = _time_steps(step, _key(0), n_steps=8, n_rolls=2)
            reps = max(1, R // 2)
            flops = reps * (8.0 * m * k * n + 8.0 * m * n * k)
            tf = flops / dt / 1e12
            per_shape[f"{m}x{k}x{n}"] = round(tf, 1)
            print(f"  cmatmul[{precision_name}] {m}x{k}x{n}: {tf:.1f} "
                  f"TF(8mkn)", flush=True)
            best = max(best, tf)
    finally:
        if prev is None:
            os.environ.pop("OFDM_LTE_TPU_MATMUL_PRECISION", None)
        else:
            os.environ["OFDM_LTE_TPU_MATMUL_PRECISION"] = prev
        jax.clear_caches()
    return best, per_shape


def measure_vpu_parallel(mb=64, degree=64, streams=4):
    """Like measure_vpu but with `streams` INDEPENDENT Horner accumulators
    advanced in lockstep — breaks the single loop-carried FMA dependency
    per element, exposing instruction-level parallelism to the VPU
    pipeline. The max over both variants is the calibrated elementwise
    ceiling."""
    n = mb * 1024 * 1024 // 4

    def step(key):
        s = 1.0 + 0.0 * jax.random.uniform(key, ())
        x = _iota_f32(n) * np.float32(0.05)
        accs = [x * (s + i) for i in range(streams)]
        for i in range(degree):
            accs = [a * x + np.float32(1.0 / (i + j + 2))
                    for j, a in enumerate(accs)]
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        return jnp.sum(out)

    dt = _time_steps(step, _key(0), n_steps=10, n_rolls=2)
    return 2.0 * degree * streams * n / dt / 1e9


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
    out["vpu_parallel_gflops"] = round(measure_vpu_parallel(), 1)
    print("vpu parallel:", out["vpu_parallel_gflops"], "GFLOP/s", flush=True)
    out["rng_gnormals_s"] = round(measure_rng(), 2)
    print("rng:", out["rng_gnormals_s"], "Gnormals/s", flush=True)
    # RNG-implied elementwise rate in the cost models' currency (26 VPU
    # flops per normal: counter bits + Box-Muller) — a fused program
    # demonstrably sustains this, so the VPU ceiling must be >= it
    out["vpu_rng_implied_gflops"] = round(out["rng_gnormals_s"] * 26.0, 1)
    # the calibrated elementwise ceiling: best demonstrated rate
    out["vpu_ceiling_gflops"] = max(out["vpu_fused_gflops"],
                                    out["vpu_parallel_gflops"],
                                    out["vpu_rng_implied_gflops"])
    print("vpu ceiling:", out["vpu_ceiling_gflops"], "GFLOP/s", flush=True)
    # per-precision effective cmatmul ceilings at the modem's shapes
    # (8mkn convention) — max with the mono-GEMM ceiling, a ceiling is
    # the best demonstrated rate for the unit
    out["cmatmul_modem"] = {}
    for pname, gemm_key in (("default", "gemm_default_tflops"),
                            ("highest", "gemm_highest_tflops")):
        best, per_shape = measure_cmatmul_modem(pname)
        out["cmatmul_modem"][pname] = {"best_tflops_8mkn": round(best, 1),
                                       "per_shape": per_shape}
        out[f"mxu_{pname}_ceiling_tflops"] = round(
            max(best, out[gemm_key]), 1)
        print(f"mxu {pname} ceiling:", out[f"mxu_{pname}_ceiling_tflops"],
              "TF (8mkn-effective)", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "machine_peaks.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("saved", path, flush=True)


if __name__ == "__main__":
    main()
