"""MIMO examples: SIMO MRC diversity, 2-TX Alamouti SFBC, TM4 spatial
multiplexing and TM6 beamforming.

Run: python examples/example_mimo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.api import OFDMSimulator


def main():
    config = LTEConfig(bandwidth=10.0, modulation="16-QAM")
    bits = np.random.default_rng(0).integers(0, 2, 200_000)

    sim = OFDMSimulator(config, channel_type="rayleigh_mp",
                        itu_profile="Pedestrian_A", velocity_kmh=3.0)

    print("SIMO MRC receive diversity (Rayleigh Ped-A @ 12 dB):")
    for n_rx in (1, 2, 4):
        r = sim.simulate_simo(bits, snr_db=12.0, num_rx=n_rx)
        print(f"  1x{n_rx}: BER={r['ber']:.2e}")

    print("\n2-TX Alamouti SFBC (Rayleigh @ 12 dB):")
    r = sim.simulate_miso(bits, snr_db=12.0)
    print(f"  2x1 MISO: BER={r['ber']:.2e}")
    r = sim.simulate_mimo(bits, snr_db=12.0, num_rx=2)
    print(f"  2x2 MIMO: BER={r['ber']:.2e}")

    awgn_sim = OFDMSimulator(config)
    print("\nTM6 beamforming (flat channel @ 15 dB):")
    for n_tx in (2, 4, 8):
        r = awgn_sim.simulate_beamforming(bits[:100_000], snr_db=15.0,
                                          num_tx=n_tx, num_rx=1)
        print(f"  {n_tx}x1: BER={r['ber']:.2e} "
              f"gain={r['beamforming_gain_db']:.2f} dB")

    print("\nTM4 spatial multiplexing 2x2 (flat channel @ 25 dB):")
    for det in ("MMSE", "SIC"):
        r = awgn_sim.simulate_spatial_multiplexing(
            bits[:100_000], snr_db=25.0, num_tx=2, num_rx=2, rank=2,
            detector_type=det)
        print(f"  {det}: BER={r['ber']:.2e}")


if __name__ == "__main__":
    main()
