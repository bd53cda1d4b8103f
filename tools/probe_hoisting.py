"""Test the loop-invariant-hoisting hypothesis for the >1 roofline
fractions (VERDICT r4 task 2 follow-up).

The bench's serialized harness varies only the PRNG key per step; the
TX bits are CONSTANT. Every key-independent stage (qam_map, the fused
scatter+IDFT+CP matmul, PAPR, and — in the freq-AWGN design, where noise
is injected directly at the received bins — even the RX DFT of the
constant TX signal) is loop-invariant, so XLA hoists it out of the scan.
The measured step then covers only the key-dependent tail (RNG + bin
add + estimate/equalize + demap + error count), while the cost model
charges the full chain -> modeled/measured > 1.

Here we time the SAME SISO shape two ways:
- const_bits: the bench harness (bits constant, key varies) — hoistable;
- keyed_bits: bits XOR a key-derived mask each step — every stage becomes
  key-dependent, nothing hoists. The extra work is one VPU pass over the
  bit array (~0.01 ms at these shapes), so any large step-time difference
  is the hoisted matmul/VPU work, not the mask.

Run: python tools/probe_hoisting.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _time_steps, _key, _rolls_record  # noqa: E402

OUT = {}
_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "hoisting_probe.json")
try:
    with open(_PATH) as _f:
        OUT = json.load(_f)
except (OSError, ValueError):
    OUT = {}


def _rec(name, val):
    OUT[name] = val
    with open(_PATH, "w") as f:
        json.dump(OUT, f, indent=2)
    shown = val if not isinstance(val, dict) else {
        k: v for k, v in val.items() if k != "rolls"}
    print(f"## {name}: {shown}", flush=True)


def main():
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import siso

    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    lanes = 256
    rng = np.random.default_rng(0)
    n = siso.bits_per_frame(cfg, 14)
    bits = jnp.asarray(rng.integers(0, 2, (lanes, n)).astype(np.int8))
    snr = jnp.full((lanes,), 15.0, jnp.float32)

    def step_const(key):
        r = siso.simulate_siso(key, bits, snr, cfg)
        return r.bit_errors, r.papr_db

    def step_keyed(key):
        # flip every bit with p=1/2 from the step key: bits become
        # key-dependent, the whole TX side must re-run each step
        mask = jax.random.bernoulli(key, 0.5, bits.shape).astype(bits.dtype)
        r = siso.simulate_siso(key, jnp.bitwise_xor(bits, mask), snr, cfg)
        return r.bit_errors, r.papr_db

    for name, fn in (("siso_const_bits", step_const),
                     ("siso_keyed_bits", step_keyed)):
        dt = _time_steps(fn, _key(0), n_steps=10, n_rolls=2,
                         slow_step_s=lanes / 60000.0, max_extra_rolls=1)
        _rec(name, {"ms_per_step": round(dt * 1e3, 3),
                    "frames_per_s": round(lanes / dt, 1),
                    "rolls": _rolls_record()})

    c, k = OUT["siso_const_bits"], OUT["siso_keyed_bits"]
    _rec("hoisted_share", round(
        1.0 - c["ms_per_step"] / k["ms_per_step"], 3))


if __name__ == "__main__":
    main()
