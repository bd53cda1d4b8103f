"""Lane scaling of the round-4 bin-domain spatial 2x2 pipeline (real TPU).

The bin-domain rewrite cut the per-lane work ~35%, which moves the
dispatch-floor amortization point: probe frames/s at rising lane counts.

Usage: python tools/probe_spatial_lanes.py [lanes ...]
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from bench import _time_steps, _key
from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.sim import spatial


def main():
    lane_counts = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    n_bits = spatial.bits_per_frame(cfg, 14)
    rng = np.random.default_rng(0)
    results = {}
    for lanes in lane_counts:
        bits = jnp.asarray(rng.integers(0, 2, (lanes, n_bits)).astype(np.int8))
        snr = jnp.full((lanes,), 15.0, jnp.float32)

        def step(key):
            r = spatial.simulate_spatial_multiplexing(
                key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
                detector_type="MMSE")
            return r.bit_errors

        dt = _time_steps(step, _key(0), n_steps=10, n_rolls=2,
                         slow_step_s=lanes / 30000.0, max_extra_rolls=1)
        results[lanes] = {"us_per_step": round(dt * 1e6, 1),
                          "frames_per_s": round(lanes / dt, 1)}
        print(f"lanes={lanes}: {lanes / dt:.0f} frames/s", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
