"""Measure the 'block' BCJR impl + full coded chain on the real TPU.

Usage: python tools/profile_block.py [lanes ...]
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
    print(f"{tag}: {dt*1e3:.2f} ms/step (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    lanes_list = [int(a) for a in sys.argv[1:]] or [32, 128]
    key = jax.random.PRNGKey(0)
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    K = 6080

    os.environ["OFDM_LTE_TPU_BCJR"] = "block"
    lanes0 = lanes_list[0]
    llr = jax.random.normal(key, (lanes0, 3 * K + 12), jnp.float32) * 4.0
    for blk in (32, 64, 128):
        os.environ["OFDM_LTE_TPU_BCJR_BLOCK"] = str(blk)
        jax.clear_caches()

        def dec(k, llr=llr):
            l2 = llr * (1.0 + 1e-6 * jax.random.uniform(k, ()))
            return turbo.turbo_decode(l2, K, 8)

        dt = time_fn(dec, key,
                     tag=f"block L={blk} 8it lanes={lanes0}")
        print(f"  -> per BCJR: {dt/17*1e3:.2f} ms", flush=True)
    os.environ["OFDM_LTE_TPU_BCJR_BLOCK"] = "64"

    for lanes in lanes_list:
        bits = jnp.asarray(rng.integers(0, 2, (lanes, 6000)).astype(np.int32))
        snr = jnp.full((lanes,), 5.0, jnp.float32)

        def full(k, bits=bits, snr=snr):
            r = coded.simulate_siso_coded_batched(k, bits, snr, cfg)
            return r.bit_errors, r.crc_pass

        dt = time_fn(full, key, tag=f"full chain [block] lanes={lanes}")
        print(f"  -> {lanes/dt:.1f} TB/s", flush=True)
        r = coded.simulate_siso_coded_batched(jax.random.fold_in(key, 7),
                                              bits, snr, cfg)
        print(f"  crc_pass_fraction "
              f"{float(jnp.mean(r.crc_pass.astype(jnp.float32))):.4f}",
              flush=True)
    os.environ.pop("OFDM_LTE_TPU_BCJR", None)
    os.environ.pop("OFDM_LTE_TPU_BCJR_BLOCK", None)


if __name__ == "__main__":
    main()
