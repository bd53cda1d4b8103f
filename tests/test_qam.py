"""QAM map/demap/detect/LLR parity with the reference's binary (non-Gray)
mapping (/root/reference/core/modulator.py:28-112, ofdm_core.py:791-923)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ofdm_lte_tpu.ops import qam
from ofdm_lte_tpu import cplx

MODS = ["QPSK", "16-QAM", "64-QAM"]


def ref_bits_to_symbols(bits, mod):
    """Reference-style per-symbol mapping loop (modulator.py:61-88)."""
    const = qam.constellation(mod)
    bps = qam.spec(mod).bits_per_symbol
    out = []
    for i in range(len(bits) // bps):
        grp = bits[i * bps:(i + 1) * bps]
        idx = int("".join(map(str, grp.astype(int))), 2)
        out.append(const[idx % len(const)])
    return np.asarray(out)


def ref_symbols_to_bits(symbols, mod):
    """Reference nearest-neighbour argmin demap (modulator.py:90-112)."""
    const = qam.constellation(mod)
    bps = qam.spec(mod).bits_per_symbol
    bits = []
    for s in symbols:
        idx = int(np.argmin(np.abs(const - s)))
        bits.extend(int(b) for b in format(idx, f"0{bps}b"))
    return np.asarray(bits)


@pytest.mark.parametrize("mod", MODS)
def test_constellation_unit_energy(mod):
    c = qam.constellation(mod)
    assert np.isclose(np.mean(np.abs(c) ** 2), 1.0, atol=1e-12)


@pytest.mark.parametrize("mod", MODS)
def test_map_matches_reference(mod, rng):
    bits = rng.integers(0, 2, 1200).astype(np.int32)
    got = qam.modulate(jnp.asarray(bits), mod).to_numpy()
    ref = ref_bits_to_symbols(bits, mod)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("mod", MODS)
def test_demap_roundtrip(mod, rng):
    bits = rng.integers(0, 2, 1200).astype(np.int32)
    syms = qam.modulate(jnp.asarray(bits), mod)
    back = np.asarray(qam.demodulate(syms, mod))
    np.testing.assert_array_equal(back, bits)


@pytest.mark.parametrize("mod", MODS)
def test_noisy_demap_matches_reference_argmin(mod, rng):
    """Closed-form per-axis quantization == argmin nearest neighbour."""
    bits = rng.integers(0, 2, 600).astype(np.int32)
    syms = qam.modulate(jnp.asarray(bits), mod).to_numpy()
    noisy = syms + 0.1 * (rng.standard_normal(len(syms))
                          + 1j * rng.standard_normal(len(syms)))
    got = np.asarray(qam.demodulate(cplx.from_numpy(noisy), mod))
    ref = ref_symbols_to_bits(noisy, mod)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("mod", MODS)
def test_detect_returns_constellation_points(mod, rng):
    noisy = cplx.from_numpy(rng.standard_normal(128) + 1j * rng.standard_normal(128))
    det = qam.detect(noisy, mod).to_numpy()
    const = qam.constellation(mod)
    d = np.abs(det[:, None] - const[None, :]).min(axis=1)
    assert d.max() < 1e-6


def test_qpsk_llrs_match_reference_formula(rng):
    """qpsk LLR = (2/σ²)·y·√2 interleaved [I,Q] (ofdm_core.py:791-813)."""
    y = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    nv = 0.25
    got = np.asarray(qam.llrs(cplx.from_numpy(y), nv, "QPSK"))
    exp = np.zeros(128)
    exp[0::2] = (2.0 / nv) * y.real * np.sqrt(2)
    exp[1::2] = (2.0 / nv) * y.imag * np.sqrt(2)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


@pytest.mark.parametrize("mod", ["16-QAM", "64-QAM"])
def test_maxlog_llrs_match_reference(mod, rng):
    """Per-axis max-log == the reference's 2-D min-distance search with
    ±10 clipping (ofdm_core.py:815-923)."""
    const = qam.constellation(mod)
    bps = qam.spec(mod).bits_per_symbol
    bit_map = np.array([[(i >> (bps - 1 - b)) & 1 for b in range(bps)]
                        for i in range(len(const))])
    y = (rng.standard_normal(50) + 1j * rng.standard_normal(50)) * 0.8
    nv = np.full(50, 0.3)

    ref = np.zeros(50 * bps)
    for si, yv in enumerate(y):
        for b in range(bps):
            d0 = np.min(np.abs(yv - const[bit_map[:, b] == 0]) ** 2)
            d1 = np.min(np.abs(yv - const[bit_map[:, b] == 1]) ** 2)
            ref[si * bps + b] = np.clip((d1 - d0) / (2 * nv[si]), -10, 10)

    got = np.asarray(qam.llrs(cplx.from_numpy(y), jnp.asarray(nv), mod))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mod", MODS)
def test_llr_sign_matches_hard_decision(mod, rng):
    bits = rng.integers(0, 2, 480).astype(np.int32)
    syms = qam.modulate(jnp.asarray(bits), mod)
    llr = np.asarray(qam.llrs(syms, 0.1, mod))
    hard = (llr < 0).astype(np.int32)   # LLR<0 -> bit 1
    np.testing.assert_array_equal(hard, bits)
