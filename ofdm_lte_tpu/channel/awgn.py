"""AWGN channel: key-threaded, batched.

Matches /root/reference/core/channel.py:10-80 semantics: the SNR is defined
against the *measured* mean power of the input signal (per transmission), and
complex noise has variance σ²/2 per I/Q component.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cplx import C


def awgn(key: jax.Array, signal: C, snr_db, measure_axes=None) -> C:
    """Add complex white Gaussian noise at the given SNR.

    signal: C of any shape. snr_db may be a scalar or broadcastable array
    (e.g. one SNR per Monte-Carlo lane). measure_axes: axes over which signal
    power is averaged to define the SNR (default: all).
    """
    snr_lin = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    p = signal.abs2()
    if measure_axes is None:
        sig_power = jnp.mean(p)
    else:
        sig_power = jnp.mean(p, axis=measure_axes, keepdims=True)
    # align per-lane SNR (leading axes) against the kept-dims power shape
    if snr_lin.ndim > 0 and snr_lin.ndim < sig_power.ndim:
        snr_lin = snr_lin.reshape(snr_lin.shape
                                  + (1,) * (sig_power.ndim - snr_lin.ndim))
    noise_power = sig_power / snr_lin
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(noise_power / 2.0)
    nr = jax.random.normal(kr, signal.re.shape, jnp.float32) * std
    ni = jax.random.normal(ki, signal.im.shape, jnp.float32) * std
    return C(signal.re + nr, signal.im + ni)


def noise_like(key: jax.Array, shape, noise_power) -> C:
    """Complex Gaussian noise with total variance noise_power (σ²/2 per leg)."""
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(jnp.asarray(noise_power, jnp.float32) / 2.0)
    return C(jax.random.normal(kr, shape, jnp.float32) * std,
             jax.random.normal(ki, shape, jnp.float32) * std)
