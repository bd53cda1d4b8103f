"""A/B the Jakes tap-hold granularity on the SIMO 1x4 and SFBC 2x1
Rayleigh chains (real TPU).

tap hold = generate the Jakes tap waveforms every g samples and hold
inside the block (g chosen so fd·g/fs stays < 2% — far finer than the
receiver's own slot-constant channel assumption). Kills the (L, T)
tap-waveform HBM write + re-read that dominates the channel-FIR cost
model. Accept/reject on measurement + the BER spot-check printed at the
end.

Usage: python tools/probe_tap_hold.py [lanes] [n_rolls]
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


def measure(tag, step, lanes, n_rolls, results):
    dt = _time_steps(step, _key(0), n_steps=10, n_rolls=n_rolls,
                     slow_step_s=lanes / 500.0, max_extra_rolls=1)
    results[tag] = {"us_per_step": round(dt * 1e6, 1),
                    "frames_per_s": round(lanes / dt, 1)}
    print(f"{tag}: {lanes / dt:.0f} frames/s", flush=True)


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_rolls = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rng = np.random.default_rng(0)
    results = {}

    cfg_simo = LTEConfig(bandwidth=5.0, modulation="QPSK")
    bits_simo = jnp.asarray(rng.integers(
        0, 2, (lanes, siso.bits_per_frame(cfg_simo, 14))).astype(np.int8))
    snr = jnp.full((lanes,), 10.0, jnp.float32)

    def step_simo(key):
        r = diversity.simulate_simo(key, bits_simo, snr, cfg_simo, num_rx=4,
                                    channel_type="rayleigh_mp",
                                    itu_profile="Pedestrian_A",
                                    velocity_kmh=3.0)
        return r.bit_errors

    cfg_sfbc = LTEConfig(bandwidth=10.0, modulation="16-QAM")
    bits_sfbc = jnp.asarray(rng.integers(
        0, 2, (lanes, diversity.sfbc_bits_per_frame(cfg_sfbc, 14))
    ).astype(np.int8))
    snr15 = jnp.full((lanes,), 15.0, jnp.float32)

    def step_sfbc(key):
        r = diversity.simulate_sfbc(key, bits_sfbc, snr15, cfg_sfbc,
                                    num_rx=1, channel_type="rayleigh_mp",
                                    itu_profile="Pedestrian_A",
                                    velocity_kmh=3.0)
        return r.bit_errors

    for mode in ("1", "auto"):
        os.environ["OFDM_LTE_TPU_TAP_HOLD"] = mode
        jax.clear_caches()
        measure(f"simo_hold_{mode}", step_simo, lanes, n_rolls, results)
        measure(f"sfbc_hold_{mode}", step_sfbc, lanes, n_rolls, results)
        # BER spot-check at the probe SNRs
        r1 = diversity.simulate_simo(_key(5), bits_simo, snr, cfg_simo,
                                     num_rx=4, channel_type="rayleigh_mp",
                                     itu_profile="Pedestrian_A",
                                     velocity_kmh=3.0)
        r2 = diversity.simulate_sfbc(_key(6), bits_sfbc, snr15, cfg_sfbc,
                                     num_rx=1, channel_type="rayleigh_mp",
                                     itu_profile="Pedestrian_A",
                                     velocity_kmh=3.0)
        results[f"ber_hold_{mode}"] = {
            "simo": float(jnp.mean(r1.ber)), "sfbc": float(jnp.mean(r2.ber))}
        print(f"ber hold={mode}: simo {results[f'ber_hold_{mode}']['simo']:.5f} "
              f"sfbc {results[f'ber_hold_{mode}']['sfbc']:.5f}", flush=True)
    os.environ.pop("OFDM_LTE_TPU_TAP_HOLD", None)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
