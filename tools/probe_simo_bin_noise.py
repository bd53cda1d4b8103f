"""A/B the SIMO 1x4 Rayleigh chain: per-leg time-domain AWGN (default)
vs bin-domain noise with an optimization_barrier pinning the faded legs
(VERDICT r3 task 9 — the round-3 revert attributed the bin-noise
regression to Jakes-chain rematerialization; the barrier is the direct
test). Accept/reject on measurement.

Usage: python tools/probe_simo_bin_noise.py [lanes] [n_rolls]
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
from ofdm_lte_tpu.sim import siso, diversity


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_rolls = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, siso.bits_per_frame(cfg, 14))).astype(np.int8))
    snr = jnp.full((lanes,), 10.0, jnp.float32)
    results = {}

    def step(key):
        r = diversity.simulate_simo(key, bits, snr, cfg, num_rx=4,
                                    channel_type="rayleigh_mp",
                                    itu_profile="Pedestrian_A",
                                    velocity_kmh=3.0)
        return r.bit_errors

    for mode in ("time", "bins"):
        os.environ["OFDM_LTE_TPU_SIMO_NOISE"] = mode
        jax.clear_caches()
        dt = _time_steps(step, _key(0), n_steps=10, n_rolls=n_rolls,
                         slow_step_s=lanes / 500.0, max_extra_rolls=1)
        results[mode] = {"us_per_step": round(dt * 1e6, 1),
                         "frames_per_s": round(lanes / dt, 1)}
        print(f"{mode}: {lanes / dt:.0f} frames/s", flush=True)
    os.environ.pop("OFDM_LTE_TPU_SIMO_NOISE", None)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
