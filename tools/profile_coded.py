"""Profile the batched coded chain on the real TPU: where does the time go?

Times (serialized, scan-chained like bench.py) the full
simulate_siso_coded_batched at several lane counts, then the turbo decoder
alone (both BCJR impls), then the BCJR sub-stages, to locate the hotspot.

Usage: python tools/profile_coded.py [lanes ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.sim import coded
from ofdm_lte_tpu.coding import turbo


def time_fn(fn, key, n_steps=5, tag=""):
    """Serialized steps via scan carry (same methodology as bench.py)."""
    def body(carry, i):
        k = jax.random.fold_in(key, i + carry)
        out = fn(k)
        total = sum(jnp.sum(o).astype(jnp.int32) for o in jax.tree.leaves(out))
        return total, total

    @jax.jit
    def run(key):
        final, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_steps))
        return final

    t0 = time.perf_counter()
    jax.block_until_ready(run(key))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run(jax.random.fold_in(key, 999)))
    dt = (time.perf_counter() - t0) / n_steps
    print(f"{tag}: {dt*1e3:.1f} ms/step (compile {compile_s:.0f}s)")
    return dt


def main():
    lanes_list = [int(a) for a in sys.argv[1:]] or [32, 64]
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    K = 6080  # 6000-bit TB -> single block K=6080
    Kp = K + 3

    for lanes in lanes_list:
        bits = jnp.asarray(rng.integers(0, 2, (lanes, 6000)).astype(np.int32))
        snr = jnp.full((lanes,), 5.0, jnp.float32)

        def full(k, bits=bits, snr=snr):
            r = coded.simulate_siso_coded_batched(k, bits, snr, cfg)
            return r.bit_errors, r.crc_pass

        dt = time_fn(full, key, tag=f"full chain lanes={lanes}")
        print(f"  -> {lanes/dt:.1f} TB/s")

    # decoder alone: random LLRs, 8 iterations
    lanes = lanes_list[0]
    llr = jax.random.normal(key, (lanes, 3 * K + 12), jnp.float32) * 4.0

    for impl in ("assoc", "scan"):
        os.environ["OFDM_LTE_TPU_BCJR"] = impl

        def dec(k, llr=llr):
            l2 = llr * (1.0 + 1e-6 * jax.random.uniform(k, ()))
            return turbo.turbo_decode(l2, K, 8)

        dt = time_fn(dec, key, tag=f"turbo_decode[{impl}] 8it lanes={lanes}")
        print(f"  -> per BCJR call: {dt/17*1e3:.2f} ms")

        def bcjr1(k, llr=llr):
            ls = llr[..., :Kp] * (1.0 + 1e-6 * jax.random.uniform(k, ()))
            lp = llr[..., Kp:2 * Kp]
            la = jnp.zeros_like(ls)
            return turbo._bcjr(ls, lp, la, impl=impl)

        time_fn(bcjr1, key, tag=f"single BCJR[{impl}] lanes={lanes}")
    os.environ.pop("OFDM_LTE_TPU_BCJR", None)

    # encode-side + link-only breakdown
    bits = jnp.asarray(rng.integers(0, 2, (lanes, 6000)).astype(np.int32))
    snr = jnp.full((lanes,), 5.0, jnp.float32)

    def chain_no_decode(k):
        # encode + link + LLRs, skipping the decoder: reuse internals by
        # running the batched chain with 0 decoder iterations
        r = coded.simulate_siso_coded_batched(k, bits, snr, cfg,
                                              num_iterations=0)
        return r.bit_errors

    time_fn(chain_no_decode, key, tag=f"chain minus iterations lanes={lanes}")


if __name__ == "__main__":
    main()
