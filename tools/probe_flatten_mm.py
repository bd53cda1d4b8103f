"""Interleaved A/B of the modem-matmul batch-flattening (real TPU).

The backend has multi-minute slow phases that poison sequential A/Bs, so
this probe alternates flatten-on / flatten-off measurements of the SAME
workload several times and compares pairwise medians.

Usage: python tools/probe_flatten_mm.py [lanes] [rounds]
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _time_steps, _key
from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.sim import spatial


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, spatial.bits_per_frame(cfg, 14))).astype(np.int8))
    snr = jnp.full((lanes,), 15.0, jnp.float32)

    def step(key):
        r = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
            detector_type="MMSE")
        return r.bit_errors

    times = {"1": [], "0": []}
    for rnd in range(rounds):
        for mode in ("1", "0"):
            os.environ["OFDM_LTE_TPU_FLATTEN_MM"] = mode
            jax.clear_caches()
            dt = _time_steps(step, _key(0), n_steps=10, n_rolls=1)
            times[mode].append(dt * 1e6)
            print(f"round {rnd} flatten={mode}: {dt * 1e6:.0f} us/step "
                  f"({lanes / dt:.0f} f/s)", flush=True)
    os.environ.pop("OFDM_LTE_TPU_FLATTEN_MM", None)
    med = {k: float(np.median(v)) for k, v in times.items()}
    # pairwise comparison rides out phase drift
    wins = sum(a < b for a, b in zip(times["1"], times["0"]))
    print(json.dumps({"us_median_flatten_on": round(med["1"], 1),
                      "us_median_flatten_off": round(med["0"], 1),
                      "pairwise_wins_on": wins, "rounds": rounds,
                      "all_on_us": [round(t, 1) for t in times["1"]],
                      "all_off_us": [round(t, 1) for t in times["0"]]}),
          flush=True)


if __name__ == "__main__":
    main()
