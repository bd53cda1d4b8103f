"""Stage-level timing of the spatial-multiplexing pipeline on the real TPU.

The 2x2 20 MHz 64-QAM spatial step measures ~7.4 ms at 256 lanes — far
above the ~1.4 ms serialized-step floor, so unlike SISO it is genuinely
compute-bound. This tool isolates the stages (TX precode+modulate,
channel, RX DFTs, per-symbol CRS estimation, MIMO detection) to find the
hotspot.

Usage: python tools/profile_spatial_stages.py [lanes] [n_rolls]
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bench import _time_steps, _key

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu import cplx
from ofdm_lte_tpu.cplx import C
from ofdm_lte_tpu.grid import grid_for, orthogonal_pilot_indices
from ofdm_lte_tpu.ops import qam, ofdm
from ofdm_lte_tpu.mimo import codebook as cb, layer_mapper, detector
from ofdm_lte_tpu.rx.mimo_estimation import estimate_per_tx
from ofdm_lte_tpu.sim import spatial
from ofdm_lte_tpu.channel.mimo import transmit_spatial_multiplexing


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

    # full step (reference)
    def full(key):
        r = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
            detector_type="MMSE")
        return r.bit_errors
    timed("full_step", full)

    # ---- rebuild the stages exactly as _simulate_spatial_jit ----
    W = cb.get_precoder(0, num_tx, "TM4", rank)
    Wc = C(jnp.asarray(W.real, jnp.float32), jnp.asarray(W.imag, jnp.float32))
    nd = g.num_data
    bps = cfg.bits_per_symbol
    padded = layer_mapper.padded_length(nd, rank)
    m = padded // rank
    pil_idx = orthogonal_pilot_indices(cfg, num_tx)

    def tx_stage(bits):
        syms = qam.modulate(bits, cfg.modulation).reshape(
            (lanes, S, nd))
        syms = cplx.pad(syms, [(0, 0)] * 2 + [(0, padded - nd)])
        layers = layer_mapper.map_to_layers(syms, rank)
        x = cplx.matmul_small(Wc, layers)
        tx_sigs = []
        for tx in range(num_tx):
            sig = ofdm.modulate_custom(x[..., tx, :], cfg, g.data_idx[:m],
                                       pil_idx[tx], tx % 4)
            tx_sigs.append(sig.reshape(
                (lanes, S * cfg.samples_per_ofdm_symbol)))
        return cplx.stack(tx_sigs, axis=0)

    def txonly(key):
        s = scale(key)
        sigs = tx_stage(bits)
        return jnp.sum(sigs.re * s), jnp.sum(sigs.im)
    timed("tx_precode_modulate", txonly)

    sigs0 = jax.jit(tx_stage)(bits)

    def chan(key):
        y, _H = transmit_spatial_multiplexing(key, sigs0, snr, num_rx,
                                              "awgn", None)
        return jnp.sum(y.re), jnp.sum(y.im)
    timed("channel_awgn", chan)

    y0, _H0 = jax.jit(lambda k: transmit_spatial_multiplexing(
        k, sigs0, snr, num_rx, "awgn", None))(_key(3))

    def rxdft(key):
        s = scale(key)
        yf = ofdm.frame_stream(C(y0.re * s, y0.im), cfg)
        y_data = ofdm.demodulate_bins(yf, cfg, g.data_idx[:m])
        y_pil = ofdm.demodulate_bins(yf, cfg, g.pilot_idx)
        return (jnp.sum(y_data.re), jnp.sum(y_pil.re))
    timed("rx_dfts", rxdft)

    yf0 = jax.jit(lambda: ofdm.frame_stream(y0, cfg))()
    yd0 = jax.jit(lambda: ofdm.demodulate_bins(yf0, cfg, g.data_idx[:m]))()
    yp0 = jax.jit(lambda: ofdm.demodulate_bins(yf0, cfg, g.pilot_idx))()

    def est(key):
        s = scale(key)
        h = estimate_per_tx(C(yp0.re * s, yp0.im), cfg, num_tx,
                            out_bins=g.data_idx[:m])
        return jnp.sum(h.re), jnp.sum(h.im)
    timed("estimate_per_tx", est)

    h0 = jax.jit(lambda: estimate_per_tx(yp0, cfg, num_tx,
                                         out_bins=g.data_idx[:m]))()

    def det(key):
        s = scale(key)
        y_det = C(jnp.moveaxis(yd0.re * s, 0, -1),
                  jnp.moveaxis(yd0.im, 0, -1))
        h_det = C(jnp.moveaxis(jnp.moveaxis(h0.re, 0, -1), -3, -1),
                  jnp.moveaxis(jnp.moveaxis(h0.im, 0, -1), -3, -1))
        noise_var = 10.0 ** (-snr / 10.0)
        layers_rx = detector.detect(y_det, h_det, noise_var,
                                    detector_type="MMSE", W=Wc,
                                    modulation=cfg.modulation)
        return jnp.sum(layers_rx.re), jnp.sum(layers_rx.im)
    timed("detect_mmse", det)

    def demap(key):
        s = scale(key)
        lr = C(jnp.moveaxis(yd0.re * s, 0, -1), jnp.moveaxis(yd0.im, 0, -1))
        lr = C(lr.re.swapaxes(-1, -2), lr.im.swapaxes(-1, -2))
        syms_rx = layer_mapper.demap_from_layers(lr, original_length=nd)
        flat = syms_rx.reshape((lanes, S * nd))
        b = qam.demodulate(flat, cfg.modulation).astype(bits.dtype)
        return jnp.sum((b != bits).astype(jnp.int32), -1)
    timed("layer_demap_qam_count", demap)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
