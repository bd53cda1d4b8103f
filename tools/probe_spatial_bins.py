"""A/B the spatial 2x2 pipeline: bin-domain flat channel + plane detector
(round 4) vs the time-domain path (round 3 shape) on the real TPU.

Usage: python tools/probe_spatial_bins.py [lanes] [n_rolls]
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bench import _time_steps, _key

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.sim import spatial


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_rolls = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    rng = np.random.default_rng(0)
    n_bits = spatial.bits_per_frame(cfg, 14)
    bits = jnp.asarray(rng.integers(0, 2, (lanes, n_bits)).astype(np.int8))
    snr = jnp.full((lanes,), 15.0, jnp.float32)
    results = {}

    def step(key):
        r = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
            detector_type="MMSE")
        return r.bit_errors

    for mode in ("bins", "time"):
        os.environ["OFDM_LTE_TPU_SPATIAL_CHANNEL"] = mode
        jax.clear_caches()
        dt = _time_steps(step, _key(0), n_steps=10, n_rolls=n_rolls,
                         slow_step_s=lanes / 400.0, max_extra_rolls=1)
        results[mode] = {"us_per_step": round(dt * 1e6, 1),
                         "frames_per_s": round(lanes / dt, 1)}
        print(f"{mode}: {lanes / dt:.0f} frames/s", flush=True)
    os.environ.pop("OFDM_LTE_TPU_SPATIAL_CHANNEL", None)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
