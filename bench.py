"""Benchmark: OFDM frames/s/chip on the flagship pipeline (real TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline workload (BASELINE.json): 20 MHz 64-QAM. Until the 2x2 spatial
pipeline lands, the metric is the end-to-end SISO link (QAM -> grid ->
IDFT+CP -> AWGN -> DFT -> CRS estimation -> ZF -> demap -> BER), batched over
Monte-Carlo lanes on one chip. A frame is one 14-symbol LTE subframe.

Baseline denominator (reference NumPy on this machine, see BASELINE.md):
simulate_siso 20 MHz 64-QAM AWGN = 3.581 frames/s.
"""
import json
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

REF_SISO_FPS = 3.581        # reference NumPy, this machine (BASELINE.md)
REF_SPATIAL_FPS = 1.472     # reference 2x2 rank-2 MMSE


def main():
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import siso

    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    num_symbols = 14
    lanes = 64                 # Monte-Carlo frames per step
    n_bits = siso.bits_per_frame(cfg, num_symbols)

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (lanes, n_bits)).astype(np.int32))
    snr = jnp.full((lanes,), 15.0, jnp.float32)

    @jax.jit
    def step(key, bits, snr):
        r = siso.simulate_siso(key, bits, snr, cfg)
        return r.bit_errors, r.papr_db

    key = jax.random.PRNGKey(0)
    # compile + warmup
    out = step(key, bits, snr)
    jax.block_until_ready(out)

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        out = step(jax.random.fold_in(key, i), bits, snr)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames = lanes * n_steps
    fps = frames / dt
    result = {
        "metric": "ofdm_frames_per_s_per_chip_20MHz_64QAM_siso",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_SISO_FPS, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
