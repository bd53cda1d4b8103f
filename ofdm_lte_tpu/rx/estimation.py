"""CRS channel estimation + equalization, batched over OFDM symbols.

Replaces /root/reference/core/lte_receiver.py:

- LS at pilots Ĥp = Yp / Xp                       (lte_receiver.py:72-75)
- linear interpolation between pilots + constant edge extrapolation over all
  N bins                                          (lte_receiver.py:98-133)
  -> implemented as two static gathers + a lerp using the precomputed
  (left, right, weight) tables from grid.interp_table.
- pilot-SNR estimate mean|Yp|²/mean|Yp-Xp|²       (lte_receiver.py:77-80)
- slot-periodic estimation: one estimate per 14-symbol slot, reused within
  the slot                                        (lte_receiver.py:360-411)
  -> a gather with symbol→slot-start index map (a reshape in disguise).
- ZF equalization  X̂ = Y/(Ĥ+ε), ε=1e-6           (lte_receiver.py:154-180)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import cplx
from ..cplx import C
from ..config import LTEConfig
from ..grid import grid_for, pilot_sequence, interp_table, interp_table_custom

SLOT_SIZE = 14  # OFDM symbols per LTE slot (lte_receiver.py:233)


def ls_at_pilots(rx_pilot_bins: C, cell_id: int = 0) -> C:
    """LS estimate Ĥ = Y/X at pilot bins. rx_pilot_bins: (..., num_pilot)."""
    known = pilot_sequence(cell_id, rx_pilot_bins.shape[-1])
    kn = cplx.const(known)
    # pilots are ±(1+1j)/√2 (unit modulus): Y/X = Y·conj(X)/|X|² = Y·conj(X)
    return rx_pilot_bins * kn.conj()


def pilot_snr_db(rx_pilot_bins: C, cell_id: int = 0, axis=None) -> jnp.ndarray:
    known = cplx.const(pilot_sequence(cell_id, rx_pilot_bins.shape[-1]))
    p = jnp.mean(rx_pilot_bins.abs2(), axis=axis)
    err = rx_pilot_bins - known
    n = jnp.mean(err.abs2(), axis=axis)
    return 10.0 * jnp.log10(p / (n + 1e-10) + 1e-10)


def interpolate(h_pilots: C, config: LTEConfig, out_bins: np.ndarray = None,
                pilot_idx: np.ndarray = None) -> C:
    """Linear interp of pilot estimates to `out_bins` (default: all N bins).

    h_pilots: (..., num_pilot) -> (..., len(out_bins)). Exactly reproduces the
    reference's per-segment np.linspace with edge hold.
    """
    if pilot_idx is None:
        left, right, w = interp_table(config.N, config.Nc)
    else:
        left, right, w = interp_table_custom(tuple(int(i) for i in pilot_idx),
                                             config.N)
    if out_bins is not None:
        left = left[out_bins]
        right = right[out_bins]
        w = w[out_bins]
    wl = jnp.asarray(1.0 - w)
    wr = jnp.asarray(w)
    hl = cplx.take(h_pilots, jnp.asarray(left), axis=-1)
    hr = cplx.take(h_pilots, jnp.asarray(right), axis=-1)
    return C(wl * hl.re + wr * hr.re, wl * hl.im + wr * hr.im)


def slot_periodic(values: C, num_symbols: int, slot_size: int = SLOT_SIZE) -> C:
    """Broadcast slot-start estimates to every symbol in the slot.

    values: (..., num_slots, K) where num_slots = ceil(S/slot_size)
    -> (..., S, K), implementing lte_receiver.py:379-406.
    """
    sym2slot = jnp.asarray(np.arange(num_symbols) // slot_size, jnp.int32)
    return cplx.take(values, sym2slot, axis=-2)


def slot_start_indices(num_symbols: int, slot_size: int = SLOT_SIZE) -> np.ndarray:
    return np.arange(0, num_symbols, slot_size)


def zf_equalize(y: C, h: C, regularization: float = 1e-6) -> C:
    """Zero-forcing X̂ = Y/(Ĥ+ε) with the reference's real-added ε
    (lte_receiver.py:174: `received / (channel_estimate + 1e-6)`)."""
    h_reg = C(h.re + regularization, h.im)
    return y / h_reg


def mrc_combine(y: C, h: C, antenna_axis: int = 0,
                regularization: float = 1e-10) -> C:
    """Frequency-domain maximum-ratio combining over an antenna axis:
        Ŝ = Σ_i conj(H_i)·Y_i / (Σ_i |H_i|² + ε)
    replacing the triple Python loop at /root/reference/core/ofdm_core.py:1405-1534."""
    num = (h.conj() * y).sum(axis=antenna_axis)
    den = h.abs2().sum(axis=antenna_axis) + regularization
    return C(num.re / den, num.im / den)
