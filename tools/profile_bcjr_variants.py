"""Isolate fused-BCJR cost: emissions vs carry-only vs scan baseline.

Usage: python tools/profile_bcjr_variants.py [lanes]
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ofdm_lte_tpu.coding import turbo


def time_fn(fn, key, n_steps=8, tag=""):
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


K = 6080
Kp = K + 3
R = 8


def fused_core(ls, lp, la, emit="stack"):
    """Standalone fused alpha+beta with selectable emission strategy."""
    ns_t, sys_t, par_t = turbo.trellis_tables()
    ps_t, pi_t = turbo.reverse_trellis()
    ns_flat = jnp.asarray(ns_t.reshape(-1))
    ps_flat = jnp.asarray(ps_t.reshape(-1))
    pi_flat = jnp.asarray(pi_t.reshape(-1))
    sys_sign = jnp.asarray(1.0 - 2.0 * sys_t, jnp.float32)
    par_sign = jnp.asarray(1.0 - 2.0 * par_t, jnp.float32)
    in_sign = jnp.asarray(1.0 - 2.0 * np.arange(2, dtype=np.float32))

    g = (ls[..., None, None] * sys_sign + lp[..., None, None] * par_sign
         + la[..., None, None] * in_sign[None, :]) * 0.5
    gt = jnp.moveaxis(g, -3, 0)
    lead = ls.shape[:-1]
    a0 = jnp.full(lead + (8,), -1e9, jnp.float32).at[..., 0].set(0.0)
    bK = a0

    pad = (-Kp) % R
    zpad = jnp.zeros((pad,) + gt.shape[1:], gt.dtype)
    gt_f = jnp.concatenate([gt, zpad], 0)
    gt_b = jnp.concatenate([gt[::-1], zpad], 0)
    S = (Kp + pad) // R
    bf = gt_f.reshape((S, R) + gt.shape[1:])
    bb = gt_b.reshape((S, R) + gt.shape[1:])

    def step(carry, x):
        a, b = carry
        gf, gb = x
        a_out, b_out = [], []
        for r in range(R):
            a_out.append(a)
            cand = jnp.take(a, ps_flat, axis=-1) + gf[r][..., ps_flat, pi_flat]
            a = jnp.max(cand.reshape(cand.shape[:-1] + (8, 2)), -1)
            b_out.append(b)
            cand = jnp.take(b, ns_flat, axis=-1).reshape(
                b.shape[:-1] + (8, 2)) + gb[r]
            b = jnp.max(cand, -1)
        if emit == "none":
            ys = None
        elif emit == "stack":
            ys = (jnp.stack(a_out), jnp.stack(b_out))
        else:  # tuple
            ys = (tuple(a_out), tuple(b_out))
        return (a, b), ys

    (aF, bF), ys = jax.lax.scan(step, (a0, bK), (bf, bb))
    if emit == "none":
        return aF + bF
    if emit == "stack":
        a_ys, b_ys = ys
        alphas = a_ys.reshape((S * R,) + a_ys.shape[2:])[:Kp]
        betas = b_ys.reshape((S * R,) + b_ys.shape[2:])[:Kp][::-1]
    else:
        a_t, b_t = ys
        a_ys = jnp.stack(a_t, 1)
        b_ys = jnp.stack(b_t, 1)
        alphas = a_ys.reshape((S * R,) + a_ys.shape[2:])[:Kp]
        betas = b_ys.reshape((S * R,) + b_ys.shape[2:])[:Kp][::-1]
    return alphas.sum() + betas.sum() + aF.sum() + bF.sum()


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    key = jax.random.PRNGKey(0)
    llr = jax.random.normal(key, (lanes, 3 * K + 12), jnp.float32) * 4.0
    ls, lp = llr[..., :Kp], llr[..., Kp:2 * Kp]
    la = jnp.zeros_like(ls)

    for emit in ("none", "stack", "tuple"):
        def f(k, emit=emit):
            s = 1.0 + 1e-6 * jax.random.uniform(k, ())
            return fused_core(ls * s, lp, la, emit=emit)
        time_fn(f, key, tag=f"fused-core emit={emit} lanes={lanes}")

    # scan baseline, 2 independent compiles to gauge the lottery
    for salt in (0, 1):
        def f(k, salt=salt):
            s = 1.0 + 1e-6 * jax.random.uniform(k, ()) + salt * 1e-12
            return turbo._bcjr(ls * s, lp, la, impl="scan")
        time_fn(f, key, n_steps=8 + salt, tag=f"single BCJR[scan] roll{salt}")


if __name__ == "__main__":
    main()
