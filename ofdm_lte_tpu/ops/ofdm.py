"""OFDM modulation/demodulation as fused MXU matmuls.

TPU-first design: the 128–2048-pt (I)DFTs are expressed as batched matrix
multiplies against precomputed DFT submatrices instead of an FFT call —

- the grid scatter (data bins + pilot bins + DC/guard nulls,
  /root/reference/core/resource_mapper.py:181-223), the IFFT·√N
  (core/modulator.py:242) and the cyclic-prefix prepend (modulator.py:245-248)
  all fuse into ONE complex matmul per direction plus a constant add:

      tx[s, t] = Σ_d  data[s, d] · A[t, d]  +  pilot_wave[t]

  where A = (exp(+2πi·t·k_d/N)/√N) with t running over the CP-extended time
  axis [N-cp .. N-1, 0 .. N-1] and k_d over the *data* bins only (guard/DC
  columns are zero and never materialize). pilot_wave is the constant time-
  domain CRS contribution (the pilot sequence is identical for every OFDM
  symbol in the reference, resource_mapper.py:204-206).

- the receiver computes only the needed frequency bins:
      bins[s, k] = Σ_t  y[s, t] · G[k, t],   G = exp(-2πi·k·t/N)/√N
  replacing CP strip + np.fft.fft/√N (/root/reference/core/lte_receiver.py:484-487).

A complex matmul runs as 4 real f32 MXU matmuls (see cplx.matmul). For the
sizes involved (N ≤ 2048, thousands of symbols per batch) this beats an FFT
network on the MXU and — on this backend, which exposes no FFT primitive —
it is also the only option. Matmul precision follows the process-level
policy in ofdm_lte_tpu.precision (supported default: single-pass bf16,
measured BER-identical to the f32 `highest` parity mode — see that module's
docstring for the measured deltas).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import cplx
from ..cplx import C
from ..config import LTEConfig
from ..grid import grid_for, pilot_sequence

from ..precision import matmul_precision


def _cmm(a: C, b: C) -> C:
    """Complex matmul for the modem.

    Backend selected by OFDM_LTE_TPU_CMATMUL ∈ {xla4, gauss, pallas,
    pallas_gauss}; the legacy OFDM_LTE_TPU_PALLAS=1 switch still selects
    the Pallas kernel. `gauss` variants use the 3-multiply Gauss/Karatsuba
    form (−25% MXU FLOPs, see cplx.matmul_gauss). Default: `gauss` on TPU
    (measured 191,117 vs 177,709 frames/s on the 20 MHz 64-QAM headline,
    2026-08-21, BER-equivalent — the reassociation is the same class of
    rounding change as the bf16 precision policy), `xla4` elsewhere (the
    float-faithful form the CPU parity suite runs). The `highest` f32
    parity mode also defaults to `xla4` on TPU: that mode exists to
    reproduce the float-faithful arbiter on-chip, and the Gauss
    reassociation would silently change its rounding."""
    import os
    from . import pallas_kernels
    from ..precision import matmul_precision_name
    backend = os.environ.get("OFDM_LTE_TPU_CMATMUL", "").lower()
    if not backend:
        if pallas_kernels.pallas_enabled():
            backend = "pallas"
        elif (jax.default_backend() == "tpu"
              and matmul_precision_name() != "highest"):
            backend = "gauss"
        else:
            backend = "xla4"

    # OFDM_LTE_TPU_FLATTEN_MM=1 flattens leading batch dims into the GEMM
    # M dimension before the matmul. MEASURED AND REJECTED as the default
    # (tools/probe_flatten_mm.py, 2026-08-21): at the 1024-lane spatial
    # shape the flattened (28672, 500)@(500, 2192) GEMM runs 23.4 ms/step
    # vs 15.4 ms for the native (lanes, S, tx, m) batched form — 0/4
    # pairwise wins; this backend tiles the batched dot BETTER than the
    # tall flat GEMM. Knob kept for future backends.
    lead = a.shape[:-1]
    flatten = len(lead) > 1 and os.environ.get(
        "OFDM_LTE_TPU_FLATTEN_MM", "0") == "1"
    if flatten:
        a = a.reshape((-1, a.shape[-1]))
    if backend in ("pallas", "pallas_gauss"):
        out = pallas_kernels.cmatmul(a, b, gauss=(backend == "pallas_gauss"))
    elif backend == "gauss":
        out = cplx.matmul_gauss(a, b, precision=matmul_precision())
    else:
        out = cplx.matmul(a, b, precision=matmul_precision())
    if flatten:
        out = out.reshape(lead + (out.shape[-1],))
    return out


@functools.lru_cache(maxsize=None)
def _mod_consts(N: int, Nc: int, cp: int, cell_id: int):
    """(B_re, B_im) of shape (n_data, N+cp) and pilot_wave (N+cp,) complex."""
    g = grid_for_cached(N, Nc)
    t = np.concatenate([np.arange(N - cp, N), np.arange(N)])       # (N+cp,)
    k_data = g.data_idx.astype(np.float64)
    A = np.exp(2j * np.pi * np.outer(t, k_data) / N) / np.sqrt(N)  # (N+cp, n_data)

    pilots = pilot_sequence(cell_id, g.num_pilot)
    k_pil = g.pilot_idx.astype(np.float64)
    Ap = np.exp(2j * np.pi * np.outer(t, k_pil) / N) / np.sqrt(N)
    pilot_wave = Ap @ pilots                                        # (N+cp,)

    B = A.T                                                         # (n_data, N+cp)
    return (B.real.astype(np.float32), B.imag.astype(np.float32),
            pilot_wave.real.astype(np.float32),
            pilot_wave.imag.astype(np.float32))


@functools.lru_cache(maxsize=None)
def grid_for_cached(N: int, Nc: int):
    from ..grid import make_grid
    return make_grid(N, Nc)


@functools.lru_cache(maxsize=None)
def _demod_consts(N: int, cp: int, bins: tuple):
    """(G_re, G_im) of shape (N, n_bins): time -> selected frequency bins."""
    t = np.arange(N)
    k = np.asarray(bins, np.float64)
    G = np.exp(-2j * np.pi * np.outer(t, k) / N) / np.sqrt(N)       # (N, n_bins)
    return G.real.astype(np.float32), G.imag.astype(np.float32)


def modulate_symbols(data: C, config: LTEConfig, cell_id: int = 0) -> C:
    """Map data symbols onto the LTE grid and produce CP-prefixed time signals.

    data: C (..., S, n_data) -> C (..., S, N+cp). One fused complex matmul.
    """
    Bre, Bim, pw_re, pw_im = _mod_consts(config.N, config.Nc,
                                         config.cp_length, cell_id)
    out = _cmm(data, C(jnp.asarray(Bre), jnp.asarray(Bim)))
    return C(out.re + pw_re, out.im + pw_im)


@functools.lru_cache(maxsize=None)
def _mod_consts_custom(N: int, cp: int, data_bins: tuple, pilot_bins: tuple,
                       cell_id: int):
    """Fused-modulation constants for an arbitrary static bin layout.

    Used by the SFBC / spatial-multiplexing TX paths where each antenna maps
    data to a subset of bins and carries its own orthogonal CRS pilots
    (/root/reference/core/sfbc_alamouti.py:241-262,
    core/ofdm_core.py:2642-2654)."""
    t = np.concatenate([np.arange(N - cp, N), np.arange(N)])
    k_data = np.asarray(data_bins, np.float64)
    A = np.exp(2j * np.pi * np.outer(t, k_data) / N) / np.sqrt(N)
    if len(pilot_bins):
        pilots = pilot_sequence(cell_id, len(pilot_bins))
        k_pil = np.asarray(pilot_bins, np.float64)
        Ap = np.exp(2j * np.pi * np.outer(t, k_pil) / N) / np.sqrt(N)
        pw = Ap @ pilots
    else:
        pw = np.zeros(len(t), np.complex128)
    B = A.T
    return (B.real.astype(np.float32), B.imag.astype(np.float32),
            pw.real.astype(np.float32), pw.imag.astype(np.float32))


def modulate_custom(data: C, config: LTEConfig, data_bins, pilot_bins,
                    cell_id: int) -> C:
    """Fused scatter+IDFT+CP for custom data/pilot bin layouts.

    data: C (..., S, len(data_bins)) -> C (..., S, N+cp)."""
    Bre, Bim, pw_re, pw_im = _mod_consts_custom(
        config.N, config.cp_length,
        tuple(int(b) for b in data_bins), tuple(int(b) for b in pilot_bins),
        cell_id)
    out = _cmm(data, C(jnp.asarray(Bre), jnp.asarray(Bim)))
    return C(out.re + pw_re, out.im + pw_im)


@functools.lru_cache(maxsize=None)
def _pilot_wave_const(N: int, cp: int, pilot_bins: tuple, cell_id: int):
    """Constant time-domain CRS contribution for one antenna's pilot layout:
    pw[t] = Σ_j p_j·exp(2πi·t·k_j/N)/√N over the CP-extended time axis."""
    t = np.concatenate([np.arange(N - cp, N), np.arange(N)])
    pilots = pilot_sequence(cell_id, len(pilot_bins))
    Ap = np.exp(2j * np.pi * np.outer(t, np.asarray(pilot_bins, np.float64))
                / N) / np.sqrt(N)
    pw = Ap @ pilots
    return pw.real.astype(np.float32), pw.imag.astype(np.float32)


def modulate_custom_multi(data: C, config: LTEConfig, data_bins,
                          pilot_bins_per_tx, cell_ids) -> C:
    """Fused scatter+IDFT+CP for num_tx antennas sharing ONE data-bin layout
    but carrying per-TX orthogonal CRS (the TM4 spatial TX,
    /root/reference/core/ofdm_core.py:2610-2654): the DFT submatrix depends
    only on the shared data bins, so all antennas run through a single
    batched complex matmul with the antenna axis as a batch dim — no
    per-antenna dispatch, no stack copy — plus a per-TX constant
    pilot-wave add.

    data: C (..., tx, m) with the antenna axis at -2
    -> C (..., tx, N+cp)."""
    num_tx = data.shape[-2]
    Bre, Bim, _, _ = _mod_consts_custom(
        config.N, config.cp_length,
        tuple(int(b) for b in data_bins), (), 0)
    out = _cmm(data, C(jnp.asarray(Bre), jnp.asarray(Bim)))
    pw_re = np.stack([_pilot_wave_const(
        config.N, config.cp_length,
        tuple(int(b) for b in pilot_bins_per_tx[tx]),
        int(cell_ids[tx]))[0] for tx in range(num_tx)])       # (tx, N+cp)
    pw_im = np.stack([_pilot_wave_const(
        config.N, config.cp_length,
        tuple(int(b) for b in pilot_bins_per_tx[tx]),
        int(cell_ids[tx]))[1] for tx in range(num_tx)])
    return C(out.re + pw_re, out.im + pw_im)


def modulate_grid(grid: C, config: LTEConfig) -> C:
    """IFFT·√N + CP for an explicit full N-bin grid (..., S, N) -> (..., S, N+cp).

    Used by the SFBC / spatial-multiplexing TX paths that build custom grids
    (orthogonal pilots per TX antenna)."""
    N, cp = config.N, config.cp_length
    Fre, Fim = _full_idft_consts(N, cp)
    return cplx.matmul(grid, C(jnp.asarray(Fre), jnp.asarray(Fim)),
                       precision=matmul_precision())


@functools.lru_cache(maxsize=None)
def _full_idft_consts(N: int, cp: int):
    t = np.concatenate([np.arange(N - cp, N), np.arange(N)])
    k = np.arange(N, dtype=np.float64)
    A = np.exp(2j * np.pi * np.outer(k, t) / N) / np.sqrt(N)        # (N, N+cp)
    return A.real.astype(np.float32), A.imag.astype(np.float32)


def demodulate_bins(y: C, config: LTEConfig, bins: np.ndarray) -> C:
    """CP strip + DFT/√N restricted to `bins`.

    y: C (..., S, N+cp) time-domain symbols -> C (..., S, len(bins)).
    """
    ysig = y[..., config.cp_length:]
    Gre, Gim = _demod_consts(config.N, config.cp_length,
                             tuple(int(b) for b in bins))
    return _cmm(ysig, C(jnp.asarray(Gre), jnp.asarray(Gim)))


def demodulate_full(y: C, config: LTEConfig) -> C:
    """CP strip + full-N DFT/√N: (..., S, N+cp) -> (..., S, N)."""
    return demodulate_bins(y, config, np.arange(config.N))


def frame_stream(signal: C, config: LTEConfig) -> C:
    """Chunk a flat sample stream (..., S·(N+cp)) into (..., S, N+cp) symbols,
    mirroring /root/reference/core/lte_receiver.py:444-491 (truncates trailing
    partial symbols)."""
    sps = config.samples_per_ofdm_symbol
    S = signal.shape[-1] // sps
    lead = signal.shape[:-1]
    return C(signal.re[..., :S * sps].reshape(lead + (S, sps)),
             signal.im[..., :S * sps].reshape(lead + (S, sps)))


def papr_per_symbol_db(signal: C, config: LTEConfig,
                       include_cp: bool = True) -> jnp.ndarray:
    """Per-OFDM-symbol PAPR, optionally excluding the cyclic prefix
    (reference: OFDMSystem per-symbol + no-CP variants,
    /root/reference/core/ofdm_system.py:80-230).

    signal: (..., S·(N+cp)) -> (..., S)."""
    framed = frame_stream(signal, config)
    if not include_cp:
        framed = framed[..., config.cp_length:]
    return papr_db(framed, axis=-1)


def papr_db(signal: C, axis=None) -> jnp.ndarray:
    """Peak-to-average power ratio in dB
    (/root/reference/core/ofdm_core.py:114-155)."""
    p = signal.abs2()
    peak = jnp.max(p, axis=axis)
    mean = jnp.mean(p, axis=axis)
    return 10.0 * jnp.log10(peak / mean)
