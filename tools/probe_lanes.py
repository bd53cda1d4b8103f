"""Probe SISO frames/s at lane counts beyond the current 256 sweet spot.

Usage: python tools/probe_lanes.py [lanes ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    lanes_list = [int(a) for a in sys.argv[1:]] or [384, 512]
    from ofdm_lte_tpu import LTEConfig
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    for lanes in lanes_list:
        fps, ber = bench.bench_siso(cfg, lanes=lanes, n_rolls=2)
        print(f"lanes={lanes}: {fps:.0f} frames/s "
              f"({fps/lanes:.0f}/lane), ber {ber:.5f}", flush=True)


if __name__ == "__main__":
    main()
