"""Lane scaling of the batched in-graph coded chain (real TPU).

VERDICT r3 task 3: bench pins 128 TBs/batch with no scaling curve — probe
TB/s at rising lane counts for the 6000-bit TB (and one K=6144 point) and
record the knee into results/coded_batch_scaling.json (bench.py surfaces
the artifact in BENCH_DETAILS).

Usage: python tools/probe_coded_lanes.py [lanes ...]
"""
import os
import sys
import json
import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from bench import _time_steps, _key, _rolls_record
from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.sim import coded


def measure(lanes, n_bits, cfg, n_rolls=2):
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (lanes, n_bits)).astype(np.int32))
    snr = jnp.full((lanes,), 5.0, jnp.float32)

    def step(key):
        r = coded.simulate_siso_coded_batched(key, bits, snr, cfg)
        return r.bit_errors, r.crc_pass

    dt = _time_steps(step, _key(0), n_steps=5, n_rolls=n_rolls,
                     slow_step_s=lanes / 600.0, max_extra_rolls=1)
    return {"ms_per_step": round(dt * 1e3, 2),
            "tb_per_s": round(lanes / dt, 1),
            "rolls": _rolls_record()}


def main():
    lane_counts = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    out = {"workload": "coded QPSK 5MHz AWGN @5dB, 8 iter, block-BCJR",
           "measured": datetime.date.today().isoformat(),
           "tb6000": {}, "tb6120": {}}
    for lanes in lane_counts:
        out["tb6000"][str(lanes)] = measure(lanes, 6000, cfg)
        print(f"6000-bit TB, lanes={lanes}: "
              f"{out['tb6000'][str(lanes)]['tb_per_s']} TB/s", flush=True)
    # one K=6144 point (single full-size code block after CRC+segmentation:
    # 6120 info bits + 24 TB CRC = 6144)
    out["tb6120"]["128"] = measure(128, 6120, cfg)
    print(f"6120-bit TB, lanes=128: {out['tb6120']['128']['tb_per_s']} TB/s",
          flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "coded_batch_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("saved", path, flush=True)


if __name__ == "__main__":
    main()
