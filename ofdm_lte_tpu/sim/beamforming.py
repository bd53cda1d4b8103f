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

    bits_rx = qam.demodulate(s_hat, config.modulation)
    errors = jnp.sum((bits_rx != bits).astype(jnp.int32), axis=-1)
    return BeamformingResult(bits_rx, errors, errors / bits.shape[-1],
                             gain_db, fb.pmi, s_hat)


def bits_per_frame(config: LTEConfig, num_ofdm_symbols: int) -> int:
    return grid_for(config).num_data * config.bits_per_symbol * num_ofdm_symbols
