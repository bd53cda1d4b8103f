"""QAM modulation / demodulation as branch-free vectorized arithmetic.

The reference maps bits to constellation points through per-symbol Python
loops with string formatting (/root/reference/core/modulator.py:61-112) and
detects symbols with a per-symbol nearest-neighbour argmin
(/root/reference/core/demodulator.py:191-245, core/lte_receiver.py:508-521).

Because the reference's constellations are square grids with *binary
row-major* (non-Gray) index mapping — index = r_idx·L + i_idx with the top
half of the bits selecting the real level — both mapping and nearest-point
detection factorize per axis:

- map:   bits -> integer index -> (r_idx, i_idx) -> (level[r_idx], level[i_idx]) / norm
- demap: r_idx = clip(round((re·norm - lo)/2)), independently per axis

so the hard demapper is O(1) arithmetic per symbol with no search. This exactly
reproduces the reference's argmin decisions except on measure-zero ties.

Constellation tables (reference values, modulator.py:28-59):
- QPSK:   levels per axis indexed [+1, -1]  (index 0 -> +1), norm √2
- 16-QAM: levels [-3,-1,1,3] ascending, norm √10
- 64-QAM: levels [-7..7] ascending, norm √42
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .. import cplx
from ..cplx import C


class QamSpec(NamedTuple):
    name: str
    bits_per_symbol: int     # 2k
    half_bits: int           # k bits per axis
    levels: tuple            # level value by axis-index (un-normalized)
    norm: float              # divide by this


_SPECS = {
    "QPSK": QamSpec("QPSK", 2, 1, (1.0, -1.0), float(np.sqrt(2))),
    "16-QAM": QamSpec("16-QAM", 4, 2, (-3.0, -1.0, 1.0, 3.0), float(np.sqrt(10))),
    "64-QAM": QamSpec("64-QAM", 6, 3,
                      (-7.0, -5.0, -3.0, -1.0, 1.0, 3.0, 5.0, 7.0),
                      float(np.sqrt(42))),
}


def spec(modulation: str) -> QamSpec:
    return _SPECS[modulation]


@functools.lru_cache(maxsize=None)
def constellation(modulation: str) -> np.ndarray:
    """Full constellation by index (NumPy complex), for tests/plots.

    Index ordering identical to /root/reference/core/modulator.py:28-59.
    """
    s = _SPECS[modulation]
    L = len(s.levels)
    pts = np.empty(L * L, dtype=np.complex128)
    for r in range(L):
        for i in range(L):
            pts[r * L + i] = (s.levels[r] + 1j * s.levels[i]) / s.norm
    return pts


def bits_to_indices(bits: jnp.ndarray, modulation: str) -> jnp.ndarray:
    """Pack groups of bits (MSB first) into constellation indices.

    bits: (..., n_sym · bits_per_symbol) int array -> (..., n_sym) int32.
    """
    s = _SPECS[modulation]
    b = bits.reshape(bits.shape[:-1] + (-1, s.bits_per_symbol)).astype(jnp.int32)
    weights = (2 ** np.arange(s.bits_per_symbol - 1, -1, -1)).astype(np.int32)
    return jnp.sum(b * weights, axis=-1)


def modulate(bits: jnp.ndarray, modulation: str) -> C:
    """bits (..., n·2k) -> complex symbols (..., n). Fully vectorized."""
    s = _SPECS[modulation]
    idx = bits_to_indices(bits, modulation)
    L = len(s.levels)
    r_idx = idx // L
    i_idx = idx % L
    lv = jnp.asarray(s.levels, jnp.float32)
    return C(lv[r_idx] / s.norm, lv[i_idx] / s.norm)


def _axis_index(x: jnp.ndarray, s: QamSpec) -> jnp.ndarray:
    """Nearest level index along one axis (closed-form quantizer)."""
    if s.name == "QPSK":
        # index 0 -> +1, index 1 -> -1; argmin tie at 0 resolves to index 0
        return (x < 0).astype(jnp.int32)
    L = len(s.levels)
    # ascending odd levels: level = 2·q - (L-1), q in [0, L)
    q = jnp.round((x * s.norm + (L - 1)) / 2.0)
    return jnp.clip(q, 0, L - 1).astype(jnp.int32)


def hard_indices(symbols: C, modulation: str) -> jnp.ndarray:
    """Nearest-constellation index per received symbol (no search)."""
    s = _SPECS[modulation]
    L = len(s.levels)
    return _axis_index(symbols.re, s) * L + _axis_index(symbols.im, s)


def detect(symbols: C, modulation: str) -> C:
    """Hard-decision to the nearest constellation point
    (replaces the per-symbol loop at /root/reference/core/lte_receiver.py:508-521)."""
    s = _SPECS[modulation]
    lv = jnp.asarray(s.levels, jnp.float32)
    return C(lv[_axis_index(symbols.re, s)] / s.norm,
             lv[_axis_index(symbols.im, s)] / s.norm)


def indices_to_bits(idx: jnp.ndarray, modulation: str) -> jnp.ndarray:
    """Unpack constellation indices to bits (MSB first), last axis expanded."""
    s = _SPECS[modulation]
    shifts = np.arange(s.bits_per_symbol - 1, -1, -1)
    bits = (idx[..., None] >> shifts) & 1
    return bits.reshape(idx.shape[:-1] + (-1,)).astype(jnp.int32) \
        if idx.ndim > 0 else bits.astype(jnp.int32)


def demodulate(symbols: C, modulation: str) -> jnp.ndarray:
    """Hard demap received symbols -> bit array (..., n·2k).

    Equivalent to symbols_to_bits(nearest-point) in the reference
    (/root/reference/core/modulator.py:90-112)."""
    idx = hard_indices(symbols, modulation)
    return indices_to_bits(idx, modulation)


def ser(tx: C, rx_detected: C, modulation: str) -> jnp.ndarray:
    ti = hard_indices(tx, modulation)
    ri = hard_indices(rx_detected, modulation)
    return jnp.mean((ti != ri).astype(jnp.float32))


# ---------------------------------------------------------------------------
# Soft demodulation: max-log LLRs (for the turbo-coded chain)
# ---------------------------------------------------------------------------

def llrs(symbols: C, noise_var: jnp.ndarray, modulation: str,
         clip: float = 10.0) -> jnp.ndarray:
    """Max-log LLRs, interleaved [b_{2k-1} .. b_0] per symbol (MSB first).

    LLR > 0 -> bit 0 (reference convention,
    /root/reference/core/ofdm_core.py:791-923). Because the mapping is
    per-axis separable, the 2-D max-log minimization over the constellation
    reduces exactly to 1-D minimizations over each axis's levels: the other
    axis's contribution cancels in the LLR difference.

    QPSK uses the reference's closed form (2/σ²)·y·√2 *without* clipping
    (ofdm_core.py:804-813); 16/64-QAM use min-distance differences clipped to
    ±clip (ofdm_core.py:864-866, 919-921).

    symbols: C of shape (n,); noise_var: scalar or (n,); returns (n·2k,).
    """
    s = _SPECS[modulation]
    noise_var = jnp.broadcast_to(jnp.asarray(noise_var, jnp.float32),
                                 symbols.re.shape)

    if modulation == "QPSK":
        scale = np.sqrt(2.0)
        llr_i = (2.0 / noise_var) * symbols.re * scale
        llr_q = (2.0 / noise_var) * symbols.im * scale
        return jnp.stack([llr_i, llr_q], axis=-1).reshape(
            symbols.re.shape[:-1] + (-1,))

    k = s.half_bits
    lv = np.asarray(s.levels, np.float32) / s.norm          # (L,)
    L = len(s.levels)
    axis_idx = np.arange(L)
    # bit patterns of each axis index, MSB first: (L, k)
    bit_of_level = ((axis_idx[:, None] >> np.arange(k - 1, -1, -1)) & 1)

    def axis_llrs(y: jnp.ndarray) -> jnp.ndarray:
        # squared distance of each sample to each level: (..., L)
        d2 = (y[..., None] - lv) ** 2
        out = []
        for b in range(k):
            mask1 = bit_of_level[:, b].astype(bool)
            d1 = jnp.min(jnp.where(mask1, d2, np.inf), axis=-1)
            d0 = jnp.min(jnp.where(~mask1, d2, np.inf), axis=-1)
            out.append(d1 - d0)
        return jnp.stack(out, axis=-1)                      # (..., k)

    lr = axis_llrs(symbols.re) / (2.0 * noise_var[..., None])
    li = axis_llrs(symbols.im) / (2.0 * noise_var[..., None])
    lr = jnp.clip(lr, -clip, clip)
    li = jnp.clip(li, -clip, clip)
    # symbol bit order: real-axis bits (MSB) then imag-axis bits
    per_sym = jnp.concatenate([lr, li], axis=-1)            # (..., 2k)
    return per_sym.reshape(symbols.re.shape[:-1] + (-1,))
