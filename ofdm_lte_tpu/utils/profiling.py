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

    def roofline_time_s(self, peak_flops=PEAK_F32_FLOPS,
                        peak_bw=PEAK_HBM_BYTES_S) -> float:
        return max(self.flops / peak_flops, self.bytes / peak_bw)


def _cmatmul_cost(name, m, k, n, dtype_bytes=4) -> KernelCost:
    """Complex matmul as 4 real matmuls: 8·m·k·n FLOPs; operands+result
    re/im pairs."""
    flops = 8.0 * m * k * n
    byts = dtype_bytes * 2 * (m * k + k * n + m * n)
    return KernelCost(name, flops, byts)


def siso_frame_cost(config: LTEConfig, num_symbols: int = 14,
                    lanes: int = 1) -> Dict[str, KernelCost]:
    """Dominant-kernel cost model for one SISO frame batch."""
    g = grid_for(config)
    S = lanes * num_symbols
    sps = config.samples_per_ofdm_symbol
    costs = {
        "tx_idft": _cmatmul_cost("tx_idft", S, g.num_data, sps),
        "rx_dft_data": _cmatmul_cost("rx_dft_data", S, config.N, g.num_data),
        "rx_dft_pilot": _cmatmul_cost(
            "rx_dft_pilot", lanes * max(1, num_symbols // 14), config.N,
            g.num_pilot),
    }
    return costs


def roofline_report(config: LTEConfig, num_symbols: int, lanes: int,
                    measured_step_s: float,
                    peak_flops=PEAK_F32_FLOPS) -> Dict:
    costs = siso_frame_cost(config, num_symbols, lanes)
    total_flops = sum(c.flops for c in costs.values())
    total_bytes = sum(c.bytes for c in costs.values())
    t_roofline = sum(c.roofline_time_s(peak_flops) for c in costs.values())
    return {
        "modeled_gflops": total_flops / 1e9,
        "modeled_gbytes": total_bytes / 1e9,
        "roofline_s": t_roofline,
        "measured_s": measured_step_s,
        "roofline_fraction": t_roofline / measured_step_s
        if measured_step_s else 0.0,
        "achieved_tflops": total_flops / measured_step_s / 1e12
        if measured_step_s else 0.0,
    }
