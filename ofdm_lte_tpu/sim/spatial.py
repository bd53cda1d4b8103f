"""TM4 spatial multiplexing: layer mapping, codebook precoding, orthogonal
CRS, MMSE/ZF/SIC detection.

Functional replacement for the module-level simulate_spatial_multiplexing
(/root/reference/core/ofdm_core.py:2489-2816). Reference semantics kept:

- rank/PMI decided ONCE per call from an initial channel draw
  (ofdm_core.py:2573-2589); the decision is made at trace time (NumPy)
  because the chosen rank sets downstream array shapes
- per OFDM symbol: nd QAM symbols -> zero-pad to rank multiple -> layers
  (rank, m); precoded onto the FIRST m data bins only, the rest stay zero
  (ofdm_core.py:2610-2640)
- orthogonal CRS per TX on every step-th pilot bin (ofdm_core.py:2642-2654)
- channel: flat iid CN(0,1) per link, or per-link multipath
  (channel.py:397-493)
- per-SYMBOL CRS estimation of H[rx, tx, k] (ofdm_core.py:2743-2758 — note:
  per symbol here, not per slot)
- batched (rank×rank) MIMO detection with the TX precoder W
  (mimo_detector.py), layer demap, hard demap, BER
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
from ..grid import grid_for, orthogonal_pilot_indices
from ..ops import qam, ofdm
from ..channel.mimo import spatial_mix_noiseless
from ..channel.rayleigh import make_profile
from ..rx import estimation as est
from ..rx.mimo_estimation import estimate_per_tx
from ..mimo import codebook as cb
from ..mimo import layer_mapper, detector
from ..mimo.rank_adaptation import get_feedback


class SpatialResult(NamedTuple):
    bits_rx: jnp.ndarray
    bit_errors: jnp.ndarray
    ber: jnp.ndarray
    symbols_rx: C


def decide_rank_pmi(num_tx: int, num_rx: int, snr_db: float,
                    rank="adaptive", seed: int = 0):
    """Trace-time rank/PMI decision from an initial CN(0, 1/num_tx) draw
    (ofdm_core.py:2573-2589). Returns (rank_used, pmi, W numpy)."""
    if rank == "adaptive":
        rng = np.random.RandomState(seed)
        H0 = (rng.randn(num_rx, num_tx) + 1j * rng.randn(num_rx, num_tx)) \
            / np.sqrt(2 * num_tx)
        fb = get_feedback(H0, snr_db)
        return fb["ri"], fb["pmi"], fb["W"]
    rank_used = int(rank)
    W = cb.get_precoder(0, num_tx, "TM4", rank_used)
    return rank_used, 0, W


@functools.partial(jax.jit, static_argnames=(
    "config", "num_tx", "num_rx", "rank_used", "detector_type",
    "channel_type", "itu_profile", "velocity_kmh", "frequency_ghz"))
def _simulate_spatial_jit(key, bits, snr_db, W_re, W_im, config: LTEConfig,
                          num_tx: int, num_rx: int, rank_used: int,
                          detector_type: str, channel_type: str,
                          itu_profile: str, velocity_kmh,
                          frequency_ghz) -> SpatialResult:
    g = grid_for(config)
    nd = g.num_data
    bps = config.bits_per_symbol
    lead = bits.shape[:-1]
    S = bits.shape[-1] // (nd * bps)
    W = C(W_re, W_im)                                     # (num_tx, rank)

    padded = layer_mapper.padded_length(nd, rank_used)
    m = padded // rank_used                               # symbols per layer

    profile = None
    if channel_type == "rayleigh_mp":
        profile = make_profile(itu_profile, config.fs, velocity_kmh,
                               frequency_ghz)

    # ---- TX ----
    syms = qam.modulate(bits, config.modulation).reshape(lead + (S, nd))
    syms = cplx.pad(syms, [(0, 0)] * (syms.ndim - 1) + [(0, padded - nd)])
    layers = layer_mapper.map_to_layers(syms, rank_used)  # (..., S, L, m)

    # precode: x[tx, k] = Σ_l W[tx,l]·layers[l,k]  -> (..., S, tx, m)
    # (tiny (tx×L) contraction -> VPU broadcast-FMA, not an MXU dot)
    x = cplx.matmul_small(W, layers)

    pil_idx = orthogonal_pilot_indices(config, num_tx)
    tx_sigs = []
    for tx in range(num_tx):
        data_tx = x[..., tx, :]                           # (..., S, m)
        sig = ofdm.modulate_custom(data_tx, config, g.data_idx[:m],
                                   pil_idx[tx], tx % 4)
        tx_sigs.append(sig.reshape(lead + (S * config.samples_per_ofdm_symbol,)))
    signals_tx = cplx.stack(tx_sigs, axis=0)              # (num_tx, ..., T)

    # ---- channel (fading/mixing only; noise goes in at the bins) ----
    kch, kd, kp = jax.random.split(key, 3)
    y, _H, npow = spatial_mix_noiseless(kch, signals_tx, snr_db, num_rx,
                                        channel_type, profile)

    # ---- RX ----
    # Per-RX AWGN injected at the demodulated bins: the DFT is unitary and
    # the detector only ever sees these bins, so CN(0, P_rx/snr) here is
    # statistically identical to the time-domain injection (the
    # sim/siso._receive_awgn_freq argument) at ~3x less Gaussian volume.
    yf = ofdm.frame_stream(y, config)                     # (num_rx, ..., S, sps)
    npw = npow[..., None, None]                           # (rx, ..., 1, 1)

    def add_cn(k, x):
        kr, ki = jax.random.split(k)
        std = jnp.sqrt(npw / 2.0)
        return C(x.re + jax.random.normal(kr, x.re.shape, jnp.float32) * std,
                 x.im + jax.random.normal(ki, x.im.shape, jnp.float32) * std)

    y_data = add_cn(kd, ofdm.demodulate_bins(yf, config, g.data_idx[:m]))
    y_pil = add_cn(kp, ofdm.demodulate_bins(yf, config, g.pilot_idx))
    # per-symbol estimation: (num_rx, ..., S, num_tx, m)
    h = estimate_per_tx(y_pil, config, num_tx, out_bins=g.data_idx[:m])

    # rearrange for the detector: y (..., S, m, rx), H (..., S, m, rx, tx)
    nb = y_data.ndim
    y_det = C(jnp.moveaxis(y_data.re, 0, -1), jnp.moveaxis(y_data.im, 0, -1))
    h_det = C(jnp.moveaxis(jnp.moveaxis(h.re, 0, -1), -3, -1),
              jnp.moveaxis(jnp.moveaxis(h.im, 0, -1), -3, -1))
    # h was (rx, ..., S, tx, m) -> move rx to last (=-1): (..., S, tx, m, rx)
    # -> move tx (-3) to last: (..., S, m, rx, tx)

    noise_var = 10.0 ** (-jnp.asarray(snr_db, jnp.float32) / 10.0)
    layers_rx = detector.detect(y_det, h_det, noise_var,
                                detector_type=detector_type, W=W,
                                modulation=config.modulation)
    # (..., S, m, L) -> (..., S, L, m)
    layers_rx = C(layers_rx.re.swapaxes(-1, -2), layers_rx.im.swapaxes(-1, -2))
    syms_rx = layer_mapper.demap_from_layers(layers_rx, original_length=nd)

    flat = syms_rx.reshape(lead + (S * nd,))
    bits_rx = qam.demodulate(flat, config.modulation).astype(bits.dtype)
    errors = jnp.sum((bits_rx != bits).astype(jnp.int32), axis=-1)
    return SpatialResult(bits_rx, errors, errors / bits.shape[-1], syms_rx)


def simulate_spatial_multiplexing(key, bits, snr_db, config: LTEConfig = None,
                                  num_tx: int = 4, num_rx: int = 2,
                                  rank="adaptive", detector_type: str = "MMSE",
                                  modulation: str = None,
                                  channel_type: str = "awgn",
                                  itu_profile: str = "Pedestrian_A",
                                  velocity_kmh: float = 3.0,
                                  frequency_ghz: float = 2.0,
                                  seed: int = 0) -> SpatialResult:
    """Public entry matching the reference signature (ofdm_core.py:2489)."""
    if config is None:
        config = LTEConfig(modulation=modulation or "64-QAM")
    if rank == "adaptive":
        # rank decision needs a concrete SNR (shapes depend on it)
        snr_static = float(np.asarray(snr_db).mean())
    else:
        snr_static = 0.0   # unused for fixed rank (W = codebook PMI 0)
    rank_used, _pmi, W = decide_rank_pmi(num_tx, num_rx, snr_static, rank,
                                         seed)
    return _simulate_spatial_jit(
        key, bits, snr_db,
        jnp.asarray(W.real, jnp.float32), jnp.asarray(W.imag, jnp.float32),
        config, num_tx, num_rx, rank_used, detector_type, channel_type,
        itu_profile, velocity_kmh, frequency_ghz)


def bits_per_frame(config: LTEConfig, num_ofdm_symbols: int) -> int:
    return grid_for(config).num_data * config.bits_per_symbol * num_ofdm_symbols
