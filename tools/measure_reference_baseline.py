"""Measure the reference NumPy implementation's frames/s on THIS machine.

Provides the auditable denominators for bench.py's vs_reference ratios
(BASELINE.md "Measured on this machine"). A frame is one 14-symbol LTE
subframe of the given profile.

Workloads (BASELINE.json configs):
  1. simulate_siso       20 MHz 64-QAM AWGN            (headline)
  2. simulate_siso       SC-FDM 5 MHz 16-QAM AWGN      (bench REF_SCFDM_FPS)
  3. simulate_simo 1x4   5 MHz QPSK Rayleigh Ped-A     (bench REF_SIMO_FPS)
  4. simulate_spatial_multiplexing 2x2 MMSE 20 MHz 64-QAM

Run: python tools/measure_reference_baseline.py [n_frames]
"""
import contextlib
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")

from config import LTEConfig                          # noqa: E402
from core.ofdm_core import (OFDMSimulator,            # noqa: E402
                            simulate_spatial_multiplexing)


def frame_bits(cfg, num_symbols=14, sc_fdm=False):
    """bits per 14-symbol frame for the reference's LTE grid (data
    subcarriers x bits/symbol x symbols)."""
    sys.path.insert(0, "/root/reference")
    from core.resource_mapper import LTEResourceGrid
    g = LTEResourceGrid(cfg.N, cfg.Nc)
    return len(g.get_data_indices()) * cfg.bits_per_symbol * num_symbols


def timeit(fn, n):
    fn()                                   # warmup (numpy: no compile, but
    t0 = time.perf_counter()               # touches caches)
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.default_rng(0)
    out = {}
    silent = contextlib.redirect_stdout(io.StringIO())

    # 1. SISO 20 MHz 64-QAM AWGN
    cfg = LTEConfig(bandwidth=20, modulation="64-QAM")
    bits = rng.integers(0, 2, frame_bits(cfg)).astype(int)
    with silent:
        sim = OFDMSimulator(config=cfg, channel_type="awgn", mode="lte")
        dt = timeit(lambda: sim.simulate_siso(bits, snr_db=15.0), n)
    out["siso_20MHz_64QAM_awgn"] = {"ms_per_frame": round(dt * 1e3, 1),
                                    "frames_per_s": round(1 / dt, 3)}

    # 2. SC-FDM 5 MHz 16-QAM AWGN
    cfg = LTEConfig(bandwidth=5, modulation="16-QAM")
    bits = rng.integers(0, 2, frame_bits(cfg)).astype(int)
    with silent:
        sim = OFDMSimulator(config=cfg, channel_type="awgn", mode="lte",
                            enable_sc_fdm=True)
        dt = timeit(lambda: sim.simulate_siso(bits, snr_db=15.0), n)
    out["scfdm_siso_5MHz_16QAM_awgn"] = {"ms_per_frame": round(dt * 1e3, 1),
                                         "frames_per_s": round(1 / dt, 3)}

    # 3. SIMO 1x4 QPSK 5 MHz Rayleigh Ped-A 3 km/h
    cfg = LTEConfig(bandwidth=5, modulation="QPSK")
    bits = rng.integers(0, 2, frame_bits(cfg)).astype(int)
    with silent:
        sim = OFDMSimulator(config=cfg, channel_type="rayleigh_mp",
                            mode="lte", num_channels=4,
                            itu_profile="Pedestrian_A", velocity_kmh=3.0)
        dt = timeit(lambda: sim.simulate_simo(bits, snr_db=10.0, num_rx=4),
                    n)
    out["simo_1x4_rayleigh_5MHz_QPSK"] = {"ms_per_frame": round(dt * 1e3, 1),
                                          "frames_per_s": round(1 / dt, 3)}

    # 4. spatial multiplexing 2x2 MMSE 20 MHz 64-QAM
    cfg = LTEConfig(bandwidth=20, modulation="64-QAM")
    bits = rng.integers(0, 2, frame_bits(cfg)).astype(int)
    with silent:
        dt = timeit(lambda: simulate_spatial_multiplexing(
            bits=bits, config=cfg, snr_db=15.0, num_tx=2, num_rx=2,
            rank=2, detector_type="MMSE"), max(1, n // 2))
    out["spatial_2x2_20MHz_64QAM"] = {"ms_per_frame": round(dt * 1e3, 1),
                                      "frames_per_s": round(1 / dt, 3)}

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
