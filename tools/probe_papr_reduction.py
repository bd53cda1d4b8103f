"""Isolated A/B: multi-axis (-3,-1) reductions vs chained single-axis
reductions for the spatial papr+correlation pass (real TPU).

The r4 stage profile measured the isolated papr_corr stage at ~19 ms
(both rolls agreeing) while the full 4.2 ms step contains the same math
— the axis=(-3,-1) reduction pattern lowers catastrophically standalone.
If the chained form is fast in isolation, switch ofdm.papr_db callers
with non-adjacent axes to chained reductions.

Usage: python tools/probe_papr_reduction.py [lanes]
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _time_steps, _key
from ofdm_lte_tpu.cplx import C


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S, num_tx, sps = 14, 2, 2192
    shape = (lanes, S, num_tx, sps)
    kr, ki = jax.random.split(_key(1))
    sig = C(jax.random.normal(kr, shape, jnp.float32),
            jax.random.normal(ki, shape, jnp.float32))
    results = {}

    def scale(key):
        return 1.0 + 0.0 * jax.random.uniform(key, ())

    def corr_terms(s):
        acc = []
        for t1 in range(num_tx):
            for t2 in range(t1, num_tx):
                a = C(s.re[..., t1, :], s.im[..., t1, :])
                b = C(s.re[..., t2, :], s.im[..., t2, :])
                acc.append((a * b.conj()))
        return acc

    def multi_axis(key):
        s = C(sig.re * scale(key), sig.im)
        p = s.abs2()
        papr = 10.0 * jnp.log10(jnp.max(p, axis=(-3, -1))
                                / jnp.mean(p, axis=(-3, -1)))
        rs = [t.mean(axis=(-2, -1)).re for t in corr_terms(s)]
        return jnp.sum(papr), sum(jnp.sum(r) for r in rs)

    def chained(key):
        s = C(sig.re * scale(key), sig.im)
        p = s.abs2()
        peak = jnp.max(jnp.max(p, axis=-1), axis=-2)
        mean = jnp.mean(jnp.mean(p, axis=-1), axis=-2)
        papr = 10.0 * jnp.log10(peak / mean)
        rs = [t.mean(axis=-1).mean(axis=-1).re for t in corr_terms(s)]
        return jnp.sum(papr), sum(jnp.sum(r) for r in rs)

    for tag, fn in (("multi_axis", multi_axis), ("chained", chained)):
        dt = _time_steps(fn, _key(0), n_steps=10, n_rolls=2)
        results[tag] = round(dt * 1e6, 1)
        print(f"{tag}: {dt * 1e6:.0f} us/step", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
