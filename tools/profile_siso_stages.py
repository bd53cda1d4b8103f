"""Stage-level timing of the SISO headline step on the real TPU.

Decomposes the 20 MHz 64-QAM step (bench.py headline) into partial programs
to locate the gap between the roofline model (utils/profiling) and the
measured step, and A/B-tests a frequency-domain AWGN prototype: because the
modem's DFT is unitary and the receiver only ever looks at the data/pilot
bins (CP samples and guard bins are discarded), adding CN(0, σ²) directly
at the demodulated bins is statistically identical to time-domain AWGN —
while generating ~2.1x fewer Gaussians (S·(n_data+n_pil/7) vs S·(N+cp))
and skipping the separate rx-signal write pass.

Usage: python tools/profile_siso_stages.py [lanes] [n_rolls]
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
from ofdm_lte_tpu.channel.awgn import awgn


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_rolls = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    g = grid_for(cfg)
    S = 14
    rng = np.random.default_rng(0)
    n_bits = siso.bits_per_frame(cfg, S)
    bits = jnp.asarray(rng.integers(0, 2, (lanes, n_bits)).astype(np.int8))
    snr = jnp.full((lanes,), 15.0, jnp.float32)
    results = {}

    def timed(tag, fn, n_steps=20):
        dt = _time_steps(fn, _key(0), n_steps=n_steps, n_rolls=n_rolls)
        results[tag] = round(dt * 1e6, 1)
        print(f"{tag}: {dt * 1e6:.1f} us/step "
              f"({lanes / dt:.0f} frames/s)", flush=True)

    # 1. full reference step
    def full(key):
        r = siso.simulate_siso(key, bits, snr, cfg)
        return r.bit_errors, r.papr_db
    timed("full_step", full)

    # 2. channel removed (rx = tx): everything but AWGN
    def nonoise(key):
        sig = siso.transmit(bits, cfg, "lte")
        papr = ofdm.papr_db(sig, axis=-1)
        # key folds into a no-op scale so every step still differs
        s = 1.0 + 0.0 * jax.random.uniform(key, ())
        b, _, _ = siso.receive(C(sig.re * s, sig.im), cfg, "lte")
        err = jnp.sum((b.astype(bits.dtype) != bits).astype(jnp.int32), -1)
        return err, papr
    timed("no_channel", nonoise)

    # 3. TX + PAPR only
    def txonly(key):
        s = 1.0 + 0.0 * jax.random.uniform(key, ())
        sig = siso.transmit(bits, cfg, "lte")
        return ofdm.papr_db(C(sig.re * s, sig.im), axis=-1)
    timed("tx_papr_only", txonly)

    # 4. AWGN alone over a signal-shaped array
    sps = cfg.samples_per_ofdm_symbol
    base = C(jnp.asarray(rng.standard_normal((lanes, S * sps)),
                         jnp.float32),
             jnp.asarray(rng.standard_normal((lanes, S * sps)),
                         jnp.float32))
    def awgn_only(key):
        rx = awgn(key, base, snr, measure_axes=-1)
        return jnp.sum(rx.re * rx.re + rx.im * rx.im, axis=-1)
    timed("awgn_only", awgn_only)

    # 5. frequency-domain noise prototype (full chain, AWGN at bins)
    def freq_noise(key):
        sig = siso.transmit(bits, cfg, "lte")
        papr = ofdm.papr_db(sig, axis=-1)
        snr_lin = 10.0 ** (snr / 10.0)
        p = jnp.mean(sig.abs2(), axis=-1)                   # (lanes,)
        n0 = (p / snr_lin)[..., None, None]                 # per-bin var
        y = ofdm.frame_stream(sig, cfg)
        y_data = ofdm.demodulate_bins(y, cfg, g.data_idx)   # (..., S, nd)
        slot_starts = est.slot_start_indices(S)
        y_pil = ofdm.demodulate_bins(y[..., slot_starts, :], cfg,
                                     g.pilot_idx)
        kd, kp = jax.random.split(key)
        def cn(k, x, var):
            kr, ki = jax.random.split(k)
            std = jnp.sqrt(var / 2.0)
            return C(x.re + jax.random.normal(kr, x.re.shape,
                                              jnp.float32) * std,
                     x.im + jax.random.normal(ki, x.im.shape,
                                              jnp.float32) * std)
        y_data = cn(kd, y_data, n0)
        y_pil = cn(kp, y_pil, n0)
        h_pil = est.ls_at_pilots(y_pil)
        psnr = est.pilot_snr_db(y_pil, axis=(-2, -1))
        h_slots = est.interpolate(h_pil, cfg, out_bins=g.data_idx)
        h_data = est.slot_periodic(h_slots, S)
        x_eq = est.zf_equalize(y_data, h_data)
        flat = x_eq.reshape(x_eq.shape[:-2] + (S * g.num_data,))
        b = qam.demodulate(flat, cfg.modulation).astype(bits.dtype)
        err = jnp.sum((b != bits).astype(jnp.int32), axis=-1)
        return err, papr
    timed("full_step_freq_noise", freq_noise)

    # BER sanity of the prototype at 15 dB (must match the time-domain step
    # within Monte-Carlo noise)
    r_ref = siso.simulate_siso(_key(7), bits, snr, cfg)
    err_f, _ = jax.jit(freq_noise)(_key(7))
    ber_ref = float(jnp.sum(r_ref.bit_errors)) / (lanes * n_bits)
    ber_f = float(jnp.sum(err_f)) / (lanes * n_bits)
    results["ber_time_noise"] = ber_ref
    results["ber_freq_noise"] = ber_f
    print(f"BER time-noise {ber_ref:.6f} vs freq-noise {ber_f:.6f}",
          flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
