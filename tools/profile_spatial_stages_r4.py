"""Stage-level timing of the ROUND-4 bin-domain spatial pipeline (real TPU).

Rebuilds the stages of sim/spatial._simulate_spatial_jit (channel_impl=bins)
in isolation: TX qam+precode, batched antenna matmul, papr+correlation
pass, bin channel+noise, plane estimation, plane fused MMSE, demap+count.
Each isolated stage pays the ~1.4 ms serialized-step dispatch floor; read
the numbers as (measured - floor).

Usage: python tools/profile_spatial_stages_r4.py [lanes] [n_rolls]
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
from ofdm_lte_tpu import cplx
from ofdm_lte_tpu.cplx import C
from ofdm_lte_tpu.grid import grid_for, orthogonal_pilot_indices
from ofdm_lte_tpu.ops import qam, ofdm
from ofdm_lte_tpu.mimo import codebook as cb, layer_mapper, detector
from ofdm_lte_tpu.rx.mimo_estimation import estimate_per_tx_planes
from ofdm_lte_tpu.channel.rayleigh import flat_mimo_matrix
from ofdm_lte_tpu.sim import spatial


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_rolls = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    g = grid_for(cfg)
    S = 14
    num_tx = num_rx = rank = 2
    rng = np.random.default_rng(0)
    n_bits = spatial.bits_per_frame(cfg, S)
    bits = jnp.asarray(rng.integers(0, 2, (lanes, n_bits)).astype(np.int8))
    snr = jnp.full((lanes,), 15.0, jnp.float32)
    results = {}

    def timed(tag, fn, n_steps=10):
        dt = _time_steps(fn, _key(0), n_steps=n_steps, n_rolls=n_rolls)
        results[tag] = round(dt * 1e6, 1)
        print(f"{tag}: {dt * 1e6:.1f} us/step", flush=True)

    def scale(key):
        return 1.0 + 0.0 * jax.random.uniform(key, ())

    def full(key):
        r = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
            detector_type="MMSE")
        return r.bit_errors
    timed("full_step", full)

    W = cb.get_precoder(0, num_tx, "TM4", rank)
    Wc = C(jnp.asarray(W.real, jnp.float32), jnp.asarray(W.imag, jnp.float32))
    nd = g.num_data
    padded = layer_mapper.padded_length(nd, rank)
    m = padded // rank
    pil_idx = orthogonal_pilot_indices(cfg, num_tx)

    def precode_stage(bits):
        syms = qam.modulate(bits, cfg.modulation).reshape((lanes, S, nd))
        syms = cplx.pad(syms, [(0, 0)] * 2 + [(0, padded - nd)])
        layers = layer_mapper.map_to_layers(syms, rank)
        return cplx.matmul_small(Wc, layers)           # (lanes, S, tx, m)

    def qam_precode(key):
        s = scale(key)
        x = precode_stage(bits)
        return jnp.sum(x.re * s), jnp.sum(x.im)
    timed("qam_precode", qam_precode)

    x0 = jax.jit(precode_stage)(bits)

    def txmm(key):
        s = scale(key)
        sig4 = ofdm.modulate_custom_multi(
            C(x0.re * s, x0.im), cfg, g.data_idx[:m],
            tuple(tuple(int(b) for b in p) for p in pil_idx), (0, 1))
        return jnp.sum(sig4.re), jnp.sum(sig4.im)
    timed("tx_matmul", txmm)

    sig40 = jax.jit(lambda: ofdm.modulate_custom_multi(
        x0, cfg, g.data_idx[:m],
        tuple(tuple(int(b) for b in p) for p in pil_idx), (0, 1)))()

    def paprcorr(key):
        s = scale(key)
        sig = C(sig40.re * s, sig40.im)
        papr = jnp.mean(ofdm.papr_db(sig, axis=(-3, -1)), axis=-1)
        acc = []
        for t1 in range(num_tx):
            for t2 in range(t1, num_tx):
                a = C(sig.re[..., t1, :], sig.im[..., t1, :])
                b = C(sig.re[..., t2, :], sig.im[..., t2, :])
                acc.append((a * b.conj()).mean(axis=(-2, -1)).re)
        return jnp.sum(papr), sum(jnp.sum(v) for v in acc)
    timed("papr_corr", paprcorr)

    def binchan(key):
        kch, kd, kp = jax.random.split(key, 3)
        H = flat_mimo_matrix(kch, num_rx, num_tx, (lanes,))
        pil_vals = spatial._pilot_bin_union_values(cfg.N, cfg.Nc, num_tx)
        kdr, kdi = jax.random.split(kd)
        nre = jax.random.normal(kdr, (num_rx, lanes, S, m), jnp.float32)
        nim = jax.random.normal(kdi, (num_rx, lanes, S, m), jnp.float32)
        kpr, kpi = jax.random.split(kp)
        pre = jax.random.normal(kpr, (num_rx, lanes, S, g.num_pilot),
                                jnp.float32)
        pim = jax.random.normal(kpi, (num_rx, lanes, S, g.num_pilot),
                                jnp.float32)
        out = 0.0
        for r in range(num_rx):
            acc = None
            pacc = None
            for t in range(num_tx):
                h = C(H.re[..., r, t, None, None], H.im[..., r, t, None, None])
                term = h * C(x0.re[..., t, :], x0.im[..., t, :])
                acc = term if acc is None else acc + term
                pterm = h * cplx.const(pil_vals[t])
                pacc = pterm if pacc is None else pacc + pterm
            out = out + jnp.sum(acc.re + nre[r]) + jnp.sum(pacc.re + pre[r]) \
                + jnp.sum(nim[r]) + jnp.sum(pim[r])
        return out
    timed("bin_channel_noise", binchan)

    ypil0 = [jax.jit(lambda r=r: C(
        jnp.zeros((lanes, S, g.num_pilot), jnp.float32) + 0.7,
        jnp.zeros((lanes, S, g.num_pilot), jnp.float32) - 0.1))()
        for r in range(num_rx)]
    ydat0 = [jax.jit(lambda r=r: C(
        jnp.zeros((lanes, S, m), jnp.float32) + 0.3,
        jnp.zeros((lanes, S, m), jnp.float32) + 0.2))()
        for r in range(num_rx)]

    def estim(key):
        s = scale(key)
        out = 0.0
        for r in range(num_rx):
            hp = estimate_per_tx_planes(C(ypil0[r].re * s, ypil0[r].im),
                                        cfg, num_tx, out_bins=g.data_idx[:m])
            out = out + sum(jnp.sum(h.re) + jnp.sum(h.im) for h in hp)
        return out
    timed("estimate_planes", estim)

    h0 = [[jax.jit(lambda r=r, t=t: C(
        jnp.full((lanes, S, m), 0.5 + 0.1 * r, jnp.float32),
        jnp.full((lanes, S, m), -0.2 + 0.1 * t, jnp.float32)))()
        for t in range(num_tx)] for r in range(num_rx)]

    def det(key):
        s = scale(key)
        heff = []
        for r in range(num_rx):
            row = []
            for l in range(rank):
                acc = None
                for t in range(num_tx):
                    term = C(h0[r][t].re * s, h0[r][t].im) * C(
                        Wc.re[t, l], Wc.im[t, l])
                    acc = term if acc is None else acc + term
                row.append(acc)
            heff.append(row)
        nv = 10.0 ** (-snr / 10.0)
        sp = detector.mmse2_planes(ydat0, heff, nv)
        return sum(jnp.sum(p.re) + jnp.sum(p.im) for p in sp)
    timed("detect_planes", det)

    def demap(key):
        s = scale(key)
        syms = C(jnp.stack([ydat0[0].re * s, ydat0[1].re], axis=-1),
                 jnp.stack([ydat0[0].im, ydat0[1].im], axis=-1))
        syms = syms.reshape((lanes, S, m * rank))[..., :nd]
        flat = syms.reshape((lanes, S * nd))
        b = qam.demodulate(flat, cfg.modulation).astype(bits.dtype)
        return jnp.sum((b != bits).astype(jnp.int32), -1)
    timed("demap_count", demap)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
