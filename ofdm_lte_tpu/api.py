"""High-level object API mirroring the reference's entry points.

A thin, stateful-looking facade over the functional pipelines, for users
coming from the reference:

- OFDMSimulator.simulate_{siso, siso_coded, simo, miso, mimo, beamforming}
  and simulate_spatial_multiplexing
  (/root/reference/core/ofdm_core.py:560-2816)
- OFDMModule.transmit / run_ber_sweep (/root/reference/ofdm_module.py:32-207)
- create_simulator presets (/root/reference/core/ofdm_system.py:752-793)

All methods take/return NumPy and manage PRNG keys internally (seeded,
reproducible — unlike the reference's global-RNG draws). Results are dicts
with the reference's key names.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import LTEConfig
from .grid import grid_for
from . import cplx
from .sim import siso as _siso
from .sim import diversity as _div
from .sim import beamforming as _bf
from .sim import spatial as _sp
from .sim import coded as _coded
from .utils import metrics as _metrics


class OFDMSimulator:
    """Drop-in style orchestrator (reference: ofdm_core.py:560-658)."""

    def __init__(self, config: Optional[LTEConfig] = None,
                 channel_type: str = "awgn", mode: str = "lte",
                 enable_sc_fdm: bool = False,
                 itu_profile: str = "Pedestrian_A",
                 frequency_ghz: float = 2.0, velocity_kmh: float = 0.0,
                 seed: int = 0):
        self.config = config or LTEConfig()
        self.channel_type = channel_type
        self.mode = "sc-fdm" if enable_sc_fdm else mode
        self.enable_sc_fdm = enable_sc_fdm or mode == "sc-fdm"
        self.itu_profile = itu_profile
        self.frequency_ghz = frequency_ghz
        self.velocity_kmh = velocity_kmh if velocity_kmh else None
        self._key = jax.random.PRNGKey(seed)
        self.last_results = None

    # -- internals ---------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _chan_kwargs(self):
        return dict(channel_type=self.channel_type,
                    itu_profile=self.itu_profile,
                    velocity_kmh=self.velocity_kmh,
                    frequency_ghz=self.frequency_ghz)

    @staticmethod
    def _trim(bits_rx: np.ndarray, n: int) -> np.ndarray:
        if len(bits_rx) < n:
            return np.pad(bits_rx, (0, n - len(bits_rx)))
        return bits_rx[:n]

    # -- SISO --------------------------------------------------------------
    def simulate_siso(self, bits: np.ndarray, snr_db: float = 10.0) -> Dict:
        bits = np.asarray(bits).astype(np.int32)
        n = len(bits)
        padded = _siso.pad_bits(bits, self.config, self.mode)
        r = _siso.simulate_siso(self._next_key(), jnp.asarray(padded),
                                float(snr_db), self.config, mode=self.mode,
                                **self._chan_kwargs())
        bits_rx = self._trim(np.asarray(r.bits_rx), n)
        errors = int(np.sum(bits_rx != bits))
        res = {
            "transmitted_bits": n, "received_bits": n,
            "bits_received_array": bits_rx,
            "bit_errors": errors, "errors": errors, "ber": errors / n,
            "snr_db": float(snr_db),
            "papr_db": float(r.papr_db),
            "papr_linear": float(10 ** (float(r.papr_db) / 10)),
            "pilot_snr_db": float(r.pilot_snr_db),
            "evm_percent": _metrics.evm_percent(
                __import__("ofdm_lte_tpu.ops.qam", fromlist=["qam"]).detect(
                    r.symbols_rx, self.config.modulation), r.symbols_rx),
            "symbols_rx": r.symbols_rx.to_numpy().reshape(-1),
            "signal_tx": r.signal_tx.to_numpy(),
        }
        self.last_results = res
        return res

    def simulate_siso_coded(self, bits: np.ndarray,
                            snr_db: float = 10.0,
                            use_max_log: Optional[bool] = None,
                            rv: int = 0) -> Dict:
        """use_max_log: None follows coding.turbo.USE_MAX_LOG_MAP (the
        reference's set_decoder_mode global, turbo_decoder.py:33-55);
        False = exact Log-MAP. rv: redundancy version 0-3
        (rate_matching.py:280-296)."""
        r = _coded.simulate_siso_coded(self._next_key(), bits, float(snr_db),
                                       self.config,
                                       use_max_log=use_max_log, rv=rv, **{
                                           k: v for k, v in
                                           self._chan_kwargs().items()
                                           if k != "frequency_ghz"})
        res = {
            "transmitted_bits": len(bits), "received_bits": len(bits),
            "bits_received_array": r.bits_rx,
            "bit_errors": r.bit_errors, "ber": r.ber,
            "crc_pass": r.crc_pass, "snr_db": float(snr_db),
            "papr_db": r.papr_db, "coded_bits_length": r.coded_bits_length,
            "channel_snr_db": r.channel_snr_db,
        }
        self.last_results = res
        return res

    def simulate_siso_coded_harq(self, bits: np.ndarray,
                                 snr_db: float = 10.0,
                                 rv_sequence=(0, 1, 2, 3),
                                 use_max_log: Optional[bool] = None) -> Dict:
        """HARQ retransmissions with LLR chase combining across redundancy
        versions until CRC-24A passes (sim.coded.simulate_siso_coded_harq)."""
        r = _coded.simulate_siso_coded_harq(
            self._next_key(), bits, float(snr_db), self.config,
            rv_sequence=tuple(rv_sequence), use_max_log=use_max_log, **{
                k: v for k, v in self._chan_kwargs().items()
                if k != "frequency_ghz"})
        res = {
            "transmitted_bits": len(bits), "received_bits": len(bits),
            "bits_received_array": r.bits_rx,
            "bit_errors": r.bit_errors, "ber": r.ber,
            "crc_pass": r.crc_pass, "snr_db": float(snr_db),
            "num_transmissions": r.num_transmissions,
            "rv_history": list(r.rv_history),
            "crc_history": list(r.crc_history),
        }
        self.last_results = res
        return res

    # -- SIMO / MISO / MIMO ------------------------------------------------
    def simulate_simo(self, bits: np.ndarray, snr_db: float = 10.0,
                      num_rx: int = 2, combining: str = "mrc") -> Dict:
        bits = np.asarray(bits).astype(np.int32)
        n = len(bits)
        padded = _siso.pad_bits(bits, self.config)
        r = _div.simulate_simo(self._next_key(), jnp.asarray(padded),
                               float(snr_db), self.config, num_rx=num_rx,
                               **self._chan_kwargs())
        bits_rx = self._trim(np.asarray(r.bits_rx), n)
        errors = int(np.sum(bits_rx != bits))
        res = {
            "transmitted_bits": n, "received_bits": n,
            "bits_received_array": bits_rx, "bit_errors": errors,
            "errors": errors, "ber": errors / n, "snr_db": float(snr_db),
            "papr_db": float(r.papr_db), "num_rx": num_rx,
            "combining_method": combining, "diversity_level": num_rx,
        }
        self.last_results = res
        return res

    def _simulate_sfbc(self, bits, snr_db, num_rx) -> Dict:
        bits = np.asarray(bits).astype(np.int32)
        n = len(bits)
        per = _div.sfbc_bits_per_frame(self.config, 1)
        S = int(np.ceil(n / per))
        padded = np.zeros(S * per, np.int32)
        padded[:n] = bits
        r = _div.simulate_sfbc(self._next_key(), jnp.asarray(padded),
                               float(snr_db), self.config, num_rx=num_rx,
                               **self._chan_kwargs())
        bits_rx = self._trim(np.asarray(r.bits_rx), n)
        errors = int(np.sum(bits_rx != bits))
        res = {
            "transmitted_bits": n, "received_bits": n,
            "bits_received_array": bits_rx, "bit_errors": errors,
            "errors": errors, "ber": errors / n, "snr_db": float(snr_db),
            "num_tx": 2, "num_rx": num_rx,
            "mode": "MISO-SFBC" if num_rx == 1 else "MIMO-SFBC",
            "diversity_order": 2 * num_rx, "papr_db": float(r.papr_db),
        }
        self.last_results = res
        return res

    def simulate_miso(self, bits: np.ndarray, snr_db: float = 10.0) -> Dict:
        return self._simulate_sfbc(bits, snr_db, num_rx=1)

    def simulate_mimo(self, bits: np.ndarray, snr_db: float = 10.0,
                      num_rx: int = 2) -> Dict:
        return self._simulate_sfbc(bits, snr_db, num_rx=num_rx)

    # -- beamforming / spatial multiplexing --------------------------------
    def simulate_beamforming(self, bits: np.ndarray, snr_db: float = 10.0,
                             num_tx: int = 2, num_rx: int = 1,
                             codebook_type: str = "TM6",
                             velocity_kmh: float = 3.0,
                             update_mode: str = "adaptive",
                             channel_model: str = "static") -> Dict:
        """channel_model: 'static' reproduces the reference exactly (one
        constant H per call, ofdm_core.py:2347-2349 — so the per-symbol PMI
        history is S identical entries, as the reference's per-symbol
        feedback loop produces on a constant channel); 'jakes' drives a
        time-varying channel with the precoder recomputed every
        update_period_symbols(velocity) — the AdaptiveBeamforming cadence
        (beamforming_precoder.py:202-293) actually exercised."""
        from .mimo import beamforming as _bfp
        from .mimo import csi as _csi
        bits = np.asarray(bits).astype(np.int32)
        n = len(bits)
        per = _bf.bits_per_frame(self.config, 1)
        S = int(np.ceil(n / per))
        padded = np.zeros(S * per, np.int32)
        padded[:n] = bits

        if channel_model == "jakes":
            from .config import doppler_hz as _doppler
            period = _bfp.update_period_symbols(velocity_kmh,
                                                self.frequency_ghz)
            r = _bf.simulate_beamforming_time_varying(
                self._next_key(), jnp.asarray(padded), float(snr_db),
                self.config, num_tx=num_tx, num_rx=num_rx,
                codebook_type=codebook_type, update_mode=update_mode,
                update_period=period,
                doppler_hz=float(_doppler(velocity_kmh,
                                          self.frequency_ghz)))
            pmi_history = [int(p) for p in np.asarray(r.pmi_history)]
            gain_db = float(r.beamforming_gain_db)
            extra = {"update_period_symbols": int(r.update_period),
                     "gain_history_db": np.asarray(r.gain_history_db)}
        elif channel_model == "static":
            r = _bf.simulate_beamforming(self._next_key(),
                                         jnp.asarray(padded),
                                         float(snr_db), self.config,
                                         num_tx=num_tx, num_rx=num_rx,
                                         codebook_type=codebook_type,
                                         update_mode=update_mode)
            # constant H -> the reference's per-symbol feedback loop logs
            # the same PMI once per OFDM symbol (ofdm_core.py:2366-2369)
            pmi_history = [int(r.pmi)] * S
            gain_db = float(r.beamforming_gain_db)
            extra = {}
        else:
            raise ValueError(f"unknown channel_model {channel_model!r}")

        stats = _csi.pmi_statistics(pmi_history, num_tx, codebook_type)
        bits_rx = self._trim(np.asarray(r.bits_rx), n)
        errors = int(np.sum(bits_rx != bits))
        res = {
            "transmitted_bits": n, "received_bits": n,
            "bits_received_array": bits_rx, "bit_errors": errors,
            "errors": errors, "ber": errors / n, "snr_db": float(snr_db),
            "num_tx": num_tx, "num_rx": num_rx, "mode": "Beamforming",
            "codebook_type": codebook_type,
            "beamforming_gain_db": gain_db,
            "pmi_history": pmi_history,
            "unique_pmis": stats["unique_pmis"],
            "pmi_statistics": stats,
            "velocity_kmh": velocity_kmh,
            **extra,
        }
        self.last_results = res
        return res

    def simulate_spatial_multiplexing(self, bits: np.ndarray,
                                      snr_db: float = 15.0,
                                      num_tx: int = 4, num_rx: int = 2,
                                      rank="adaptive",
                                      detector_type: str = "MMSE") -> Dict:
        bits = np.asarray(bits).astype(np.int32)
        n = len(bits)
        per = _sp.bits_per_frame(self.config, 1)
        S = int(np.ceil(n / per))
        padded = np.zeros(S * per, np.int32)
        padded[:n] = bits
        r = _sp.simulate_spatial_multiplexing(
            self._next_key(), jnp.asarray(padded), float(snr_db), self.config,
            num_tx=num_tx, num_rx=num_rx, rank=rank,
            detector_type=detector_type, channel_type=self.channel_type,
            itu_profile=self.itu_profile,
            velocity_kmh=self.velocity_kmh or 3.0)
        bits_rx = self._trim(np.asarray(r.bits_rx), n)
        errors = int(np.sum(bits_rx != bits))
        res = {
            "transmitted_bits": n, "received_bits": n,
            "bits_received_array": bits_rx, "bit_errors": errors,
            "errors": errors, "ber": errors / n, "snr_db": float(snr_db),
            "num_tx": num_tx, "num_rx": num_rx,
            "detector_type": detector_type,
            "papr_db": float(np.mean(np.asarray(r.papr_db))),
            "mode": "Spatial Multiplexing TM4",
        }
        self.last_results = res
        return res

    # -- sweeps ------------------------------------------------------------
    def run_ber_sweep(self, bits: np.ndarray, snr_range,
                      num_trials: int = 1, progress_callback=None,
                      confidence: float = 0.95) -> Dict:
        """Sequential-API sweep with per-point t-distribution confidence
        intervals (ofdm_core.py:1795-1846 + ofdm_system.py:495-504). For
        large sweeps prefer parallel.sweep.ber_sweep (sharded, one XLA
        program)."""
        snr_list = list(snr_range)
        snrs, bers, paprs, ci_lo, ci_hi = [], [], [], [], []
        for i, snr in enumerate(snr_list):
            trial_bers = []
            papr = 0.0
            for _ in range(num_trials):
                r = self.simulate_siso(bits, snr_db=float(snr))
                trial_bers.append(r["ber"])
                papr = r["papr_db"]
            m, lo, hi = _metrics.ber_confidence_interval(trial_bers,
                                                         confidence)
            snrs.append(float(snr))
            bers.append(m)
            ci_lo.append(lo)
            ci_hi.append(hi)
            paprs.append(papr)
            if progress_callback:
                progress_callback(i + 1, len(snr_list))
        return {"snr_values": np.asarray(snrs), "ber_values": np.asarray(bers),
                "ber_ci_low": np.asarray(ci_lo),
                "ber_ci_high": np.asarray(ci_hi),
                "papr_values": np.asarray(paprs)}

    def run_ber_sweep_all_modulations(self, bits: np.ndarray, snr_range,
                                      num_trials: int = 1) -> Dict:
        """Sweep every modulation scheme, rebuilding the chain per scheme
        (reference: ofdm_system.py:522-601)."""
        from .config import MODULATION_SCHEMES
        out = {}
        for mod in MODULATION_SCHEMES:
            sim = OFDMSimulator(self.config.copy(modulation=mod),
                                channel_type=self.channel_type,
                                mode=self.mode,
                                enable_sc_fdm=self.enable_sc_fdm,
                                itu_profile=self.itu_profile,
                                velocity_kmh=self.velocity_kmh or 0.0)
            out[mod] = sim.run_ber_sweep(bits, snr_range, num_trials)
        return out


class OFDMModule:
    """Backward-compat facade (reference: ofdm_module.py:32-207)."""

    def __init__(self, config: Optional[LTEConfig] = None,
                 channel_type: str = "awgn", mode: str = "lte",
                 enable_sc_fdm: bool = False, seed: int = 0, **kw):
        self.config = config or LTEConfig()
        self.simulator = OFDMSimulator(self.config, channel_type=channel_type,
                                       mode=mode, enable_sc_fdm=enable_sc_fdm,
                                       seed=seed, **kw)

    @property
    def modulation(self):
        return self.config.modulation

    @property
    def bandwidth(self):
        return self.config.bandwidth

    def transmit(self, bits: np.ndarray, snr_db: float = 10.0) -> Dict:
        return self.simulator.simulate_siso(bits, snr_db)

    def run_ber_sweep(self, bits, snr_range, num_trials: int = 1,
                      progress_callback=None) -> Dict:
        return self.simulator.run_ber_sweep(bits, snr_range, num_trials,
                                            progress_callback)


def create_simulator(preset: str = "5MHz_QPSK", **kw) -> OFDMSimulator:
    """Preset factory (reference: OFDMSystemManager, ofdm_system.py:752-793)."""
    presets = {
        "5MHz_QPSK": LTEConfig(5.0, modulation="QPSK"),
        "10MHz_16QAM": LTEConfig(10.0, modulation="16-QAM"),
        "10MHz_64QAM": LTEConfig(10.0, modulation="64-QAM"),
        "20MHz_16QAM": LTEConfig(20.0, modulation="16-QAM"),
        "20MHz_64QAM": LTEConfig(20.0, modulation="64-QAM"),
    }
    if preset not in presets:
        raise ValueError(f"Unknown preset {preset}. Options: {list(presets)}")
    return OFDMSimulator(presets[preset], **kw)
