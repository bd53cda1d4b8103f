"""A/B the spatial MIMO detector against a hand-fused closed-form 2x2 MMSE.

The stage profile (tools/profile_spatial_stages.py, 2026-08-21) puts
detect_mmse at ~2.6 ms over the serialized-step floor at 256 lanes — the
spatial pipeline's dominant stage. The generic path builds G = HᴴH via
matmul_small, adds σ²I, and runs the closed-form 2x2 solve — each step
materializing (lanes·S·m, 2, 2)-shaped HBM temporaries. This probe times
a fully hand-fused closed-form alternative (direct per-subcarrier scalar
formulas on the h-column planes, no matrix temporaries) to size the
round-4 optimization, plus the full spatial step for context.

Timing only — no product code changes; numerical agreement is asserted.

Usage: python tools/probe_detector_fused.py [lanes]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bench import _time_steps, _key

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu import cplx
from ofdm_lte_tpu.cplx import C
from ofdm_lte_tpu.grid import grid_for
from ofdm_lte_tpu.mimo import codebook as cb, detector
from ofdm_lte_tpu.sim import spatial


def mmse2_fused(y: C, H: C, sigma2) -> C:
    """Closed-form 2-layer MMSE with no matrix temporaries.

    y (..., rx), H (..., rx, 2). G = HᴴH + σ²I is 2x2 Hermitian:
        G = [[a, b], [b*, d]],  a,d real.
    ŝ = G⁻¹ Hᴴy with G⁻¹ = 1/det · [[d, -b], [-b*, a]].
    """
    h0 = C(H.re[..., 0], H.im[..., 0])        # (..., rx)
    h1 = C(H.re[..., 1], H.im[..., 1])
    s2 = jnp.asarray(sigma2, jnp.float32)
    if s2.ndim:
        s2 = s2.reshape(s2.shape + (1,) * (h0.re.ndim - 1 - s2.ndim))
    a = h0.abs2().sum(-1) + s2                # (...,) real
    d = h1.abs2().sum(-1) + s2
    b = (h0.conj() * h1).sum(-1)              # complex
    z0 = (h0.conj() * y).sum(-1)              # Hᴴy components
    z1 = (h1.conj() * y).sum(-1)
    det = a * d - b.abs2()
    inv = 1.0 / det
    s0 = C((d * z0.re - (b.re * z1.re - b.im * z1.im)) * inv,
           (d * z0.im - (b.re * z1.im + b.im * z1.re)) * inv)
    s1 = C((a * z1.re - (b.re * z0.re + b.im * z0.im)) * inv,
           (a * z1.im - (b.re * z0.im - b.im * z0.re)) * inv)
    return C(jnp.stack([s0.re, s1.re], -1), jnp.stack([s0.im, s1.im], -1))


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    g = grid_for(cfg)
    S, m = 14, 500
    rng = np.random.default_rng(0)

    def cn(*shape):
        return C(jnp.asarray(rng.standard_normal(shape), jnp.float32),
                 jnp.asarray(rng.standard_normal(shape), jnp.float32))

    W = cb.get_precoder(0, 2, "TM4", 2)
    Wc = C(jnp.asarray(W.real, jnp.float32), jnp.asarray(W.imag, jnp.float32))
    y0 = cn(lanes, S, m, 2)
    h0 = cn(lanes, S, m, 2, 2)
    noise_var = jnp.full((lanes,), 10.0 ** (-1.5), jnp.float32)

    # numerical agreement (CPU-identical formulas, f32)
    H_eff = cplx.matmul_small(h0, Wc)
    ref = detector.mmse(y0, H_eff, detector._align_sigma(noise_var, H_eff))
    alt = mmse2_fused(y0, H_eff,
                      detector._align_sigma(noise_var, H_eff))
    err = float(jnp.max(jnp.abs(ref.re - alt.re) + jnp.abs(ref.im - alt.im)))
    print(f"max |generic - fused| = {err:.2e}", flush=True)
    assert err < 1e-3

    def scale(key):
        return 1.0 + 0.0 * jax.random.uniform(key, ())

    def generic(key):
        s = scale(key)
        out = detector.detect(C(y0.re * s, y0.im), h0, noise_var,
                              detector_type="MMSE", W=Wc,
                              modulation=cfg.modulation)
        return jnp.sum(out.re), jnp.sum(out.im)

    def fused(key):
        s = scale(key)
        He = cplx.matmul_small(h0, Wc)
        out = mmse2_fused(C(y0.re * s, y0.im), He,
                          detector._align_sigma(noise_var, He))
        return jnp.sum(out.re), jnp.sum(out.im)

    for tag, fn in (("detect_generic", generic), ("detect_fused", fused)):
        dt = _time_steps(fn, _key(0), n_steps=10, n_rolls=2)
        print(f"{tag}: {dt * 1e6:.1f} us/step", flush=True)

    def full(key):
        bits = jnp.asarray(rng.integers(
            0, 2, (lanes, spatial.bits_per_frame(cfg, S))).astype(np.int8))
        snr = jnp.full((lanes,), 15.0, jnp.float32)
        r = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
            detector_type="MMSE")
        return r.bit_errors
    dt = _time_steps(full, _key(0), n_steps=10, n_rolls=2)
    print(f"full_spatial_step: {dt * 1e6:.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
