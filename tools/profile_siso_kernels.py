"""Per-kernel timing of the SISO headline's stages on the real TPU.

Finer-grained than profile_siso_stages.py: isolates the individual
kernels (QAM map, TX fused matmul, PAPR, RX DFTs, estimation+ZF+demap,
bit-error count) so each can be compared against its roofline-model entry
(utils/profiling.siso_frame_cost) — the evidence base for VALIDATION.md's
residual-overhead analysis.

Each stage varies its input through a key-dependent no-op scale so the
timing scan cannot be constant-folded, and chains steps through a carry
(bench._time_steps) so the backend cannot overlap them.

Usage: python tools/profile_siso_kernels.py [lanes] [n_rolls]
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
from ofdm_lte_tpu.cplx import C
from ofdm_lte_tpu.grid import grid_for
from ofdm_lte_tpu.ops import qam, ofdm
from ofdm_lte_tpu.rx import estimation as est
from ofdm_lte_tpu.sim import siso
from ofdm_lte_tpu.utils.profiling import siso_frame_cost


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_rolls = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    g = grid_for(cfg)
    S = 14
    rng = np.random.default_rng(0)
    n_bits = siso.bits_per_frame(cfg, S)
    bits = jnp.asarray(rng.integers(0, 2, (lanes, n_bits)).astype(np.int8))
    results = {}

    model = siso_frame_cost(cfg, S, lanes, precision="default",
                            awgn_mode="freq")

    def timed(tag, fn, n_steps=20):
        dt = _time_steps(fn, _key(0), n_steps=n_steps, n_rolls=n_rolls)
        m = model.get(tag)
        results[tag] = {"us": round(dt * 1e6, 1),
                        "model_us": round(m.roofline_time_s() * 1e6, 1)
                        if m else None}
        print(f"{tag}: {dt * 1e6:.1f} us (model "
              f"{results[tag]['model_us']})", flush=True)

    def scale(key):
        return 1.0 + 0.0 * jax.random.uniform(key, ())

    # qam map: bits -> symbols
    def qam_map(key):
        s = scale(key)
        syms = qam.modulate(bits, cfg.modulation)
        return jnp.sum(syms.re * s), jnp.sum(syms.im)
    timed("qam_map", qam_map)

    # TX fused scatter+IDFT+CP matmul (incl. pilot-wave add)
    syms0 = qam.modulate(bits, cfg.modulation).reshape(
        (lanes, S, g.num_data))
    def tx_matmul(key):
        s = scale(key)
        sig = ofdm.modulate_symbols(C(syms0.re * s, syms0.im), cfg)
        return jnp.sum(sig.re), jnp.sum(sig.im)
    timed("tx_idft", tx_matmul)

    # PAPR over the TX stream
    sig0 = siso.transmit(bits, cfg, "lte")
    def papr_only(key):
        s = scale(key)
        return ofdm.papr_db(C(sig0.re * s, sig0.im), axis=-1)
    timed("papr", papr_only)

    # RX data-bin DFT
    y0 = ofdm.frame_stream(sig0, cfg)
    def rx_dft(key):
        s = scale(key)
        bins = ofdm.demodulate_bins(C(y0.re * s, y0.im), cfg, g.data_idx)
        return jnp.sum(bins.re), jnp.sum(bins.im)
    timed("rx_dft_data", rx_dft)

    # estimation + ZF + demap + error count from pre-noised bins
    yd0 = ofdm.demodulate_bins(y0, cfg, g.data_idx)
    slot_starts = est.slot_start_indices(S)
    yp0 = ofdm.demodulate_bins(y0[..., slot_starts, :], cfg, g.pilot_idx)
    def est_demap(key):
        s = scale(key)
        b, _, _ = siso._detect_from_bins(C(yd0.re * s, yd0.im), yp0,
                                         cfg, "lte")
        return jnp.sum((b.astype(bits.dtype) != bits).astype(jnp.int32), -1)
    timed("est_zf_demap_count", est_demap)

    # freq-noise AWGN channel alone (power measure + bin RNG + add)
    def awgn_freq(key):
        b, _, _ = siso._receive_awgn_freq(key, sig0,
                                          jnp.full((lanes,), 15.0),
                                          cfg, "lte", -1)
        return jnp.sum((b.astype(bits.dtype) != bits).astype(jnp.int32), -1)
    timed("awgn_freq_plus_rx", awgn_freq)

    total_model = sum(c.roofline_time_s() for c in model.values()) * 1e6
    print(f"model total: {total_model:.1f} us", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
