"""SIMO MRC and Alamouti SFBC pipelines.

Anchors: MRC diversity gain 10-100× BER reduction 1→4 RX in Rayleigh
(SIMO/README.md:186-191); Alamouti algebra per sfbc_alamouti.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_lte_tpu import LTEConfig, cplx
from ofdm_lte_tpu.rx import alamouti
from ofdm_lte_tpu.sim import siso, diversity


def test_alamouti_encode_pattern(rng):
    """TX0=[s0,-s1*], TX1=[s1,s0*] (sfbc_alamouti.py:45-78)."""
    s = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    tx0, tx1 = alamouti.encode(cplx.from_numpy(s))
    t0, t1 = tx0.to_numpy(), tx1.to_numpy()
    for i in range(0, 8, 2):
        assert np.isclose(t0[i], s[i])
        assert np.isclose(t1[i], s[i + 1])
        assert np.isclose(t0[i + 1], -np.conj(s[i + 1]))
        assert np.isclose(t1[i + 1], np.conj(s[i]))


def test_alamouti_perfect_channel_roundtrip(rng):
    """Flat channel: decode(h0·tx0 + h1·tx1) == s (test_alamouti_unit.py)."""
    n = 64
    s = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    h0 = (rng.standard_normal() + 1j * rng.standard_normal()) / np.sqrt(2)
    h1 = (rng.standard_normal() + 1j * rng.standard_normal()) / np.sqrt(2)
    tx0, tx1 = alamouti.encode(cplx.from_numpy(s))
    r = tx0.to_numpy() * h0 + tx1.to_numpy() * h1
    dec = alamouti.decode(cplx.from_numpy(r),
                          cplx.from_numpy(np.full(n, h0)),
                          cplx.from_numpy(np.full(n, h1))).to_numpy()
    np.testing.assert_allclose(dec, s, atol=1e-4)


def test_alamouti_matches_reference_decode(rng):
    """Frequency-selective H: same combining formula as the reference's
    per-pair loop (sfbc_alamouti.py:130-162)."""
    n = 32
    s = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    H0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    H1 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    tx0, tx1 = alamouti.encode(cplx.from_numpy(s))
    r = tx0.to_numpy() * H0 + tx1.to_numpy() * H1

    ref = np.zeros(n, complex)
    for i in range(0, n, 2):
        s0c = np.conj(H0[i]) * r[i] + H1[i + 1] * np.conj(r[i + 1])
        s1c = np.conj(H1[i]) * r[i] - H0[i + 1] * np.conj(r[i + 1])
        h0a = (H0[i] + H0[i + 1]) / 2
        h1a = (H1[i] + H1[i + 1]) / 2
        norm = abs(h0a) ** 2 + abs(h1a) ** 2 + 1e-10
        ref[i] = s0c / norm
        ref[i + 1] = s1c / norm

    got = alamouti.decode(cplx.from_numpy(r), cplx.from_numpy(H0),
                          cplx.from_numpy(H1)).to_numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4)


def _bits_for(cfg, n_sym, sfbc=False, seed=0):
    rng = np.random.default_rng(seed)
    n = (diversity.sfbc_bits_per_frame(cfg, n_sym) if sfbc
         else siso.bits_per_frame(cfg, n_sym))
    return rng.integers(0, 2, n).astype(np.int32)


def test_simo_high_snr_zero_ber():
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    bits = _bits_for(cfg, 14)
    r = diversity.simulate_simo(jax.random.PRNGKey(0), jnp.asarray(bits),
                                60.0, cfg, num_rx=2)
    assert float(r.ber) == 0.0


def test_simo_mrc_array_gain_awgn():
    """MRC of N noisy copies: ~10·log10(N) SNR gain -> lower BER."""
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    errs = {}
    for n_rx in (1, 4):
        e = t = 0
        for s in range(3):
            bits = _bits_for(cfg, 28, seed=s)
            r = diversity.simulate_simo(jax.random.PRNGKey(s),
                                        jnp.asarray(bits), 4.0, cfg,
                                        num_rx=n_rx)
            e += int(r.bit_errors)
            t += len(bits)
        errs[n_rx] = e / t
    assert errs[4] < errs[1] / 8


def test_simo_rayleigh_diversity():
    """1→4 RX improves Rayleigh BER by ≥10× (SIMO/README.md:186-191)."""
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    errs = {}
    for n_rx in (1, 4):
        e = t = 0
        for s in range(3):
            bits = _bits_for(cfg, 28, seed=s)
            r = diversity.simulate_simo(
                jax.random.PRNGKey(s), jnp.asarray(bits), 12.0, cfg,
                num_rx=n_rx, channel_type="rayleigh_mp",
                itu_profile="Pedestrian_A", velocity_kmh=3.0)
            e += int(r.bit_errors)
            t += len(bits)
        errs[n_rx] = e / t
    assert errs[4] < errs[1] / 5, errs


def test_miso_high_snr_zero_ber():
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    bits = _bits_for(cfg, 14, sfbc=True)
    r = diversity.simulate_miso(jax.random.PRNGKey(0), jnp.asarray(bits),
                                60.0, cfg)
    assert float(r.ber) == 0.0


def test_mimo_rx_diversity_beats_miso():
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    e1 = e2 = t = 0
    for s in range(3):
        bits = _bits_for(cfg, 28, sfbc=True, seed=s)
        r1 = diversity.simulate_miso(jax.random.PRNGKey(s), jnp.asarray(bits),
                                     10.0, cfg)
        r2 = diversity.simulate_mimo(jax.random.PRNGKey(s), jnp.asarray(bits),
                                     10.0, cfg, num_rx=2)
        e1 += int(r1.bit_errors)
        e2 += int(r2.bit_errors)
        t += len(bits)
    assert e2 < e1, (e1, e2)


def test_sfbc_rayleigh_runs():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    bits = _bits_for(cfg, 28, sfbc=True)
    r = diversity.simulate_mimo(jax.random.PRNGKey(0), jnp.asarray(bits),
                                15.0, cfg, num_rx=2,
                                channel_type="rayleigh_mp",
                                itu_profile="Pedestrian_A", velocity_kmh=3.0)
    assert 0.0 <= float(r.ber) < 0.5


def test_sfbc_even_data_bins():
    """999 data bins @20 MHz -> 998 used for SFBC (odd dropped)."""
    cfg = LTEConfig(bandwidth=20.0)
    assert len(diversity.sfbc_data_bins(cfg)) == 998
