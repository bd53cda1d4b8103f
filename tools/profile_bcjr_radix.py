"""Radix sweep for the fused BCJR on the real TPU.

Usage: python tools/profile_bcjr_radix.py [lanes]
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

from ofdm_lte_tpu.coding import turbo


def time_fn(fn, key, n_steps=5, tag=""):
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
    print(f"{tag}: {dt*1e3:.1f} ms/step (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    key = jax.random.PRNGKey(0)
    K = 6080

    llr = jax.random.normal(key, (lanes, 3 * K + 12), jnp.float32) * 4.0
    os.environ["OFDM_LTE_TPU_BCJR"] = "fused"
    for radix in (4, 8, 16, 32):
        os.environ["OFDM_LTE_TPU_BCJR_RADIX"] = str(radix)
        jax.clear_caches()

        def dec(k, llr=llr):
            l2 = llr * (1.0 + 1e-6 * jax.random.uniform(k, ()))
            return turbo.turbo_decode(l2, K, 8)

        dt = time_fn(dec, key, tag=f"fused radix={radix} 8it lanes={lanes}")
        print(f"  -> per BCJR: {dt/17*1e3:.2f} ms", flush=True)
    os.environ.pop("OFDM_LTE_TPU_BCJR", None)
    os.environ.pop("OFDM_LTE_TPU_BCJR_RADIX", None)


if __name__ == "__main__":
    main()
