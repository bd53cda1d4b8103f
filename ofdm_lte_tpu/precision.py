"""Global matmul-precision policy for the modem's MXU kernels.

The framework's hot kernels are f32 complex matmuls (DFT modem, Jakes
generator, SC-FDM precoding). On TPU, `HIGHEST` runs true-f32 MXU passes
(bf16x3 decomposition) for numerical parity with the reference's float64
NumPy FFTs; `DEFAULT` runs single-pass bf16 MXU at ~3-6x the FLOP rate with
~2-3 decimal digits of mantissa.

Policy is process-level, selected via the environment variable

    OFDM_LTE_TPU_MATMUL_PRECISION = highest (default) | high | default

and read at trace time. BER curves at `default` stay within Monte-Carlo
bounds of the `highest` curves for QPSK/16-QAM at practical SNRs (the noise
floor dominates rounding); for 64-QAM near the error floor prefer
`highest`. bench.py reports both (`fast_precision` entries).
"""
from __future__ import annotations

import os

import jax

_LEVELS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def matmul_precision_name() -> str:
    """Current policy name (env re-read each call; jitted programs bake the
    value at first trace — flip the env + jax.clear_caches() to change it
    mid-process)."""
    name = os.environ.get("OFDM_LTE_TPU_MATMUL_PRECISION", "highest").lower()
    if name not in _LEVELS:
        raise ValueError(
            f"OFDM_LTE_TPU_MATMUL_PRECISION={name!r}; pick from {list(_LEVELS)}")
    return name


def matmul_precision() -> jax.lax.Precision:
    """Current policy as a jax.lax.Precision."""
    return _LEVELS[matmul_precision_name()]
