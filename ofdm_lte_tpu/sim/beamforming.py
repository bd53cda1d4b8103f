"""TM6/TM4 rank-1 codebook beamforming with CSI feedback.

Functional replacement for OFDMSimulator.simulate_beamforming
(/root/reference/core/ofdm_core.py:2260-2477). Reference semantics kept:

- one flat random channel H ~ CN(0,1)/√2-per-leg for the whole call
  (ofdm_core.py:2347-2349)
- frequency-domain link y = H·(W s) + n per data subcarrier — no IFFT/CP in
  this path (ofdm_core.py:2389-2400)
- noise variance is ABSOLUTE 10^(-snr/10) (not measured signal power)
- 'static'/'codebook' mode: W from PMI feedback; 'adaptive' mode: W = MRT
  (ofdm_core.py:2373-2376)
- MRC combining with H_eff = H W, normalized by Σ|H_eff|²
  (ofdm_core.py:2409-2427)

Since H is constant over the call, the per-OFDM-symbol feedback loop of the
reference collapses to a single PMI computation; all symbols process in one
batched op.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import cplx
from ..cplx import C
from ..config import LTEConfig
from ..grid import grid_for
from ..ops import qam
from ..channel.awgn import noise_like
from ..channel.rayleigh import flat_mimo_matrix
from ..mimo import codebook as cb
from ..mimo import beamforming as bf
from ..mimo import csi


class BeamformingResult(NamedTuple):
    bits_rx: jnp.ndarray
    bit_errors: jnp.ndarray
    ber: jnp.ndarray
    beamforming_gain_db: jnp.ndarray
    pmi: jnp.ndarray
    symbols_rx: C


@functools.partial(jax.jit, static_argnames=(
    "config", "num_tx", "num_rx", "codebook_type", "update_mode"))
def simulate_beamforming(key: jax.Array, bits: jnp.ndarray, snr_db,
                         config: LTEConfig, num_tx: int = 2, num_rx: int = 1,
                         codebook_type: str = "TM6",
                         update_mode: str = "adaptive") -> BeamformingResult:
    """bits (..., S·n_data·bps); leading axes are Monte-Carlo lanes."""
    g = grid_for(config)
    nd = g.num_data
    bps = config.bits_per_symbol
    lead = bits.shape[:-1]
    n_sym_total = bits.shape[-1] // bps

    kh, kn = jax.random.split(key)
    H = flat_mimo_matrix(kh, num_rx, num_tx, lead)       # (..., rx, tx)

    syms = qam.modulate(bits, config.modulation)         # (..., n_sym_total)

    fb = csi.generate_feedback(H, num_tx, noise_variance=1.0,
                               codebook_type=codebook_type)
    if update_mode == "adaptive":
        W = bf.mrt_weights(H)                            # (..., tx, 1)
    else:
        W = fb.precoder                                  # (..., tx, 1)

    He = cplx.matmul_small(H, W)                               # (..., rx, 1)
    gain_db = bf.beamforming_gain_db(H, W)

    # y[rx, k] = He[rx]·s[k] + n ; build via broadcasting
    He_b = C(He.re[..., :, 0, None], He.im[..., :, 0, None])  # (..., rx, 1)
    s_b = C(syms.re[..., None, :], syms.im[..., None, :])     # (..., 1, n)
    y = He_b * s_b                                       # (..., rx, n)

    noise_var = 10.0 ** (-jnp.asarray(snr_db, jnp.float32) / 10.0)
    if noise_var.ndim:   # per-lane SNR: align against (..., rx, n)
        noise_var = noise_var.reshape(noise_var.shape + (1, 1))
    n = noise_like(kn, y.shape, noise_var)
    y = C(y.re + n.re, y.im + n.im)

    # MRC: ŝ = Σ_rx conj(He)·y / Σ|He|²
    num = (He_b.conj() * y).sum(axis=-2)
    den = He.abs2().sum(axis=(-2, -1))[..., None]
    s_hat = C(num.re / den, num.im / den)

    bits_rx = qam.demodulate(s_hat, config.modulation).astype(bits.dtype)
    errors = jnp.sum((bits_rx != bits).astype(jnp.int32), axis=-1)
    return BeamformingResult(bits_rx, errors, errors / bits.shape[-1],
                             gain_db, fb.pmi, s_hat)


def bits_per_frame(config: LTEConfig, num_ofdm_symbols: int) -> int:
    return grid_for(config).num_data * config.bits_per_symbol * num_ofdm_symbols


class TimeVaryingBeamformingResult(NamedTuple):
    bits_rx: jnp.ndarray
    bit_errors: jnp.ndarray
    ber: jnp.ndarray
    beamforming_gain_db: jnp.ndarray       # (...,) mean realized gain
    gain_history_db: jnp.ndarray           # (..., S) per-symbol realized gain
    pmi_history: jnp.ndarray               # (..., S) int32, per OFDM symbol
    update_period: int                     # W recompute cadence (symbols)
    symbols_rx: C


@functools.partial(jax.jit, static_argnames=(
    "config", "num_tx", "num_rx", "codebook_type", "update_mode",
    "update_period", "doppler_hz"))
def simulate_beamforming_time_varying(
        key: jax.Array, bits: jnp.ndarray, snr_db, config: LTEConfig,
        num_tx: int = 2, num_rx: int = 1, codebook_type: str = "TM6",
        update_mode: str = "adaptive", update_period: int = 1,
        doppler_hz: float = 5.56) -> TimeVaryingBeamformingResult:
    """Beamforming over a Jakes time-varying flat MIMO channel with the
    precoder recomputed every `update_period` OFDM symbols — the
    AdaptiveBeamforming cadence loop the reference implements
    (/root/reference/core/beamforming_precoder.py:264-293: process_symbol
    updates W from the CURRENT channel when symbols_since_update reaches
    update_period) but never drives with a changing channel. Between
    updates W is STALE: at high Doppler the realized gain ‖H(t)W(t₀)‖²
    decays toward the unprecoded average, which is exactly what the 0.1·Tc
    cadence rule protects against.

    bits (..., S·n_data·bps); derive `update_period` with
    mimo.beamforming.update_period_symbols(velocity) and `doppler_hz` with
    config.doppler_hz(velocity). The receiver combines with the true
    instantaneous effective channel H(s)W(s) (perfect CSI at RX, like the
    reference's MRC with known H_eff, ofdm_core.py:2409-2427).
    """
    g = grid_for(config)
    nd = g.num_data
    bps = config.bits_per_symbol
    lead = bits.shape[:-1]
    S = bits.shape[-1] // (nd * bps)

    kh, kn = jax.random.split(key)
    from ..channel.rayleigh import flat_mimo_time_varying
    H = flat_mimo_time_varying(kh, num_rx, num_tx, S, doppler_hz,
                               batch_shape=lead)           # (..., S, r, t)

    # feedback at the update instants only (u·period), W held between
    upd = np.arange(0, S, update_period)                   # static
    U = len(upd)
    H_up = cplx.take(H, jnp.asarray(upd), axis=len(lead))  # (..., U, r, t)
    fb = csi.generate_feedback(H_up, num_tx, noise_variance=1.0,
                               codebook_type=codebook_type)
    if update_mode == "adaptive":
        W_up = bf.mrt_weights(H_up)                        # (..., U, t, 1)
    else:
        W_up = fb.precoder
    sym_to_upd = jnp.asarray(np.arange(S) // update_period, jnp.int32)
    W = cplx.take(W_up, sym_to_upd, axis=len(lead))        # (..., S, t, 1)
    pmi_history = jnp.take(fb.pmi, sym_to_upd, axis=-1)    # (..., S)

    He = cplx.matmul_small(H, W)                           # (..., S, r, 1)
    gain_hist = bf.beamforming_gain_db(H, W)               # (..., S)

    syms = qam.modulate(bits, config.modulation).reshape(
        lead + (S, 1, nd))                                 # (..., S, 1, nd)
    y = C(He.re, He.im) * syms                             # (..., S, r, nd)

    noise_var = 10.0 ** (-jnp.asarray(snr_db, jnp.float32) / 10.0)
    if noise_var.ndim:
        noise_var = noise_var.reshape(noise_var.shape + (1, 1, 1))
    n = noise_like(kn, y.shape, noise_var)
    y = C(y.re + n.re, y.im + n.im)

    # per-symbol MRC with the instantaneous He
    num = (He.conj() * y).sum(axis=-2)                     # (..., S, nd)
    den = He.abs2().sum(axis=(-2, -1))[..., None]
    s_hat = C(num.re / den, num.im / den).reshape(lead + (S * nd,))

    bits_rx = qam.demodulate(s_hat, config.modulation).astype(bits.dtype)
    errors = jnp.sum((bits_rx != bits).astype(jnp.int32), axis=-1)
    return TimeVaryingBeamformingResult(
        bits_rx, errors, errors / bits.shape[-1],
        jnp.mean(gain_hist, axis=-1), gain_hist, pmi_history,
        update_period, s_hat)
