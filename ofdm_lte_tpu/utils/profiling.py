"""Profiling and roofline accounting.

The reference's only instrumentation is wall-clock prints
(/root/reference/core/ofdm_system.py:249-280) and a thread-pool benchmark
(core/parallel_processing.py:181-223). Here:

- `trace(...)`: context manager around jax.profiler for TensorBoard-readable
  device traces;
- `benchmark(fn, *args)`: compile-then-steady-state timing with
  block_until_ready;
- analytic FLOP/byte models of the pipelines' dominant kernels (the DFT
  matmuls and the Jakes sinusoid matmul) and a roofline report comparing
  achieved FLOP/s and bytes/s against chip peaks.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict

import jax

from ..config import LTEConfig
from ..grid import grid_for


# TPU v5e (1 chip) peaks; override for other targets.
PEAK_F32_FLOPS = 98.3e12 / 2        # MXU f32 ~ half of bf16 throughput
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES_S = 819e9
# Vector unit f32 peak (elementwise/transcendental work: RNG, noise add,
# demap). Conservative estimate — the VPU is ~2 orders below the MXU.
PEAK_VPU_FLOPS = 4e12

# Effective MXU peak per matmul-precision policy (ofdm_lte_tpu.precision):
# HIGHEST runs multi-pass bf16 decompositions for f32-grade results (the
# empirically consistent rate on this backend is ~bf16/2), HIGH ~bf16x3,
# DEFAULT is single-pass bf16.
PEAK_MXU_BY_PRECISION = {
    "highest": PEAK_F32_FLOPS,
    "high": PEAK_BF16_FLOPS / 3,
    "default": PEAK_BF16_FLOPS,
}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, n_steps: int = 10) -> Dict:
    """Returns compile time, steady-state step time and throughput factor."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = fn(*args)
    jax.block_until_ready(out)
    step_s = (time.perf_counter() - t0) / n_steps
    return {"compile_s": compile_s, "step_s": step_s}


@dataclass
class KernelCost:
    name: str
    flops: float
    bytes: float
    peak_flops: float = PEAK_F32_FLOPS   # unit this kernel's flops run on

    def roofline_time_s(self, peak_bw=PEAK_HBM_BYTES_S) -> float:
        return max(self.flops / self.peak_flops, self.bytes / peak_bw)


def _cmatmul_cost(name, m, k, n, peak=PEAK_F32_FLOPS,
                  dtype_bytes=4) -> KernelCost:
    """Complex matmul as 4 real matmuls: 8·m·k·n FLOPs; operands+result
    re/im pairs."""
    flops = 8.0 * m * k * n
    byts = dtype_bytes * 2 * (m * k + k * n + m * n)
    return KernelCost(name, flops, byts, peak)


def siso_frame_cost(config: LTEConfig, num_symbols: int = 14,
                    lanes: int = 1,
                    precision: str = "highest",
                    bits_dtype_bytes: int = 1,
                    awgn_mode: str = "freq") -> Dict[str, KernelCost]:
    """Complete-program cost model for one SISO frame batch: every stage the
    program must execute at the speed-of-light of its unit (MXU matmuls,
    VPU elementwise/RNG, HBM passes). A matmul-only model understates the
    mandatory work — the AWGN channel alone is three full passes over the
    time-domain signal plus two Gaussian draws per sample — and so reports
    an artificially low roofline fraction for a program that is in fact
    near the hardware bound.

    Per-stage accounting (T = total time-domain samples, D = data symbols):
    - tx_idft / rx_dft: the fused modem matmuls (MXU, precision-dependent
      peak from PEAK_MXU_BY_PRECISION).
    - awgn_channel: power-measure pass (3 flops + 8 B/sample read), RNG
      (2 normals/sample, ~24 VPU flops each for counter-based bits +
      Box-Muller transcendentals), fused scale-add (4 flops/sample).
      awgn_mode="freq" (the sim's AWGN default since 2026-08-21,
      sim/siso._receive_awgn_freq): noise is injected at the received
      data/pilot BINS — unitary-DFT equivalent — so the RNG covers
      S·n_data + n_slots·n_pil bin samples instead of S·(N+cp) time
      samples and the add fuses into the demod matmul epilogue (no rx
      time-signal write). awgn_mode="time" models the generic path
      (channel/awgn.py: full time-domain noise + separate rx write).
    - qam_demap: closed-form per-axis hard decision ~30 flops/symbol, plus
      LLR-free bit emission (8 B/symbol in, bits out).
    - estimate_zf: LS at pilots + lerp + per-bin complex divide,
      ~14 flops/data bin + one H read.
    """
    g = grid_for(config)
    S = lanes * num_symbols
    sps = config.samples_per_ofdm_symbol
    T = S * sps                                   # time-domain samples
    D = S * g.num_data                            # data QAM symbols
    n_slots = max(1, num_symbols // 7)            # CRS slot starts
    # noise samples the RNG must produce (complex): all time samples in
    # "time" mode, only the received data+pilot bins in "freq" mode
    Tb = (D + lanes * n_slots * g.num_pilot) if awgn_mode == "freq" else T
    bits_per = config.bits_per_symbol
    bB = bits_dtype_bytes      # bench feeds int8 bit arrays (1 B/bit);
    #                            int32 callers pay 4 B/bit here
    mxu = PEAK_MXU_BY_PRECISION.get(precision, PEAK_F32_FLOPS)
    costs = {
        "tx_idft": _cmatmul_cost("tx_idft", S, g.num_data, sps, mxu),
        "rx_dft_data": _cmatmul_cost("rx_dft_data", S, config.N,
                                     g.num_data, mxu),
        "rx_dft_pilot": _cmatmul_cost(
            "rx_dft_pilot", lanes * max(1, num_symbols // 14), config.N,
            g.num_pilot, mxu),
        "awgn_channel": KernelCost(
            "awgn_channel",
            flops=(3 * T + (2 * 24 + 4) * Tb),
            bytes=(8 * T + (0 if awgn_mode == "freq" else 16) * Tb),
            peak_flops=PEAK_VPU_FLOPS),
        "papr": KernelCost(
            # |x|² + max/mean reductions over the full TX signal
            # (ofdm.papr_db): one read of the complex signal, 4 flops/sample
            "papr", flops=4.0 * T, bytes=8.0 * T,
            peak_flops=PEAK_VPU_FLOPS),
        "qam_map": KernelCost(
            # bits -> symbols: read bps ints per symbol (at the caller's
            # bit dtype width), closed-form per-axis map
            "qam_map", flops=10.0 * D, bytes=bB * bits_per * D + 8.0 * D,
            peak_flops=PEAK_VPU_FLOPS),
        "qam_demap": KernelCost("qam_demap", flops=30.0 * D,
                                bytes=8.0 * D + bB * bits_per * D,
                                peak_flops=PEAK_VPU_FLOPS),
        "estimate_zf": KernelCost("estimate_zf", flops=14.0 * D,
                                  bytes=8.0 * D,
                                  peak_flops=PEAK_VPU_FLOPS),
        "bit_error_count": KernelCost(
            # compare RX bits vs TX bits + reduction: two bit-array reads
            # at the caller's dtype width
            "bit_error_count", flops=2.0 * bits_per * D,
            bytes=2.0 * bB * bits_per * D, peak_flops=PEAK_VPU_FLOPS),
    }
    return costs


def roofline_report(config: LTEConfig, num_symbols: int, lanes: int,
                    measured_step_s: float,
                    precision: str = "highest",
                    bits_dtype_bytes: int = 1,
                    awgn_mode: str = "freq") -> Dict:
    costs = siso_frame_cost(config, num_symbols, lanes, precision,
                            bits_dtype_bytes, awgn_mode)
    total_flops = sum(c.flops for c in costs.values())
    total_bytes = sum(c.bytes for c in costs.values())
    t_roofline = sum(c.roofline_time_s() for c in costs.values())
    return {
        "precision": precision,
        "modeled_gflops": total_flops / 1e9,
        "modeled_gbytes": total_bytes / 1e9,
        "roofline_s": t_roofline,
        "measured_s": measured_step_s,
        "roofline_fraction": t_roofline / measured_step_s
        if measured_step_s else 0.0,
        "achieved_tflops": total_flops / measured_step_s / 1e12
        if measured_step_s else 0.0,
        "per_kernel_us": {k: round(c.roofline_time_s() * 1e6, 1)
                          for k, c in costs.items()},
    }
