"""Turbo-coded vs uncoded comparison (TS 36.212 chain).

Run: python examples/example_coded.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.api import OFDMSimulator


def main():
    config = LTEConfig(bandwidth=20.0, modulation="QPSK")
    sim = OFDMSimulator(config, channel_type="rayleigh_mp",
                        itu_profile="Pedestrian_A", velocity_kmh=3.0)
    bits = np.random.default_rng(0).integers(0, 2, 20_000)

    print("Rayleigh Ped-A, 20 MHz QPSK (cf. test_coded_image_comparison.py):")
    print(f"{'SNR':>5} | {'uncoded BER':>12} | {'coded BER':>10} | CRC")
    for snr in (3.0, 6.0, 9.0, 12.0):
        ru = sim.simulate_siso(bits, snr_db=snr)
        rc = sim.simulate_siso_coded(bits, snr_db=snr)
        print(f"{snr:5.0f} | {ru['ber']:12.2e} | {rc['ber']:10.2e} | "
              f"{'PASS' if rc['crc_pass'] else 'FAIL'}")


if __name__ == "__main__":
    main()
