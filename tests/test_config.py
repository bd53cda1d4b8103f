"""LTEConfig derivations vs the reference (config.py:101-130)."""
import numpy as np
import pytest

from ofdm_lte_tpu import LTEConfig, LTE_PROFILES


@pytest.mark.parametrize("bw,nc,n", [
    (1.25, 76, 128), (2.5, 150, 256), (5.0, 300, 512),
    (10.0, 600, 1024), (15.0, 900, 2048), (20.0, 1200, 2048),
])
def test_profiles(bw, nc, n):
    c = LTEConfig(bandwidth=bw)
    assert c.Nc == nc and c.N == n
    assert c.fs == n * 15e3
    assert c.cp_length == int(4.7e-6 * c.fs)
    assert c.samples_per_ofdm_symbol == c.N + c.cp_length


def test_off_table_bandwidth():
    c = LTEConfig(bandwidth=3.0)
    assert c.Nc == int(3.0e3 / 15.0)
    assert c.N == 256  # next power of 2


@pytest.mark.parametrize("mod,bps", [("QPSK", 2), ("16-QAM", 4), ("64-QAM", 6)])
def test_bits_per_symbol(mod, bps):
    assert LTEConfig(modulation=mod).bits_per_symbol == bps


def test_extended_cp():
    c = LTEConfig(bandwidth=5.0, cp_type="extended")
    assert c.cp_duration_us == 16.6
    c2 = LTEConfig(bandwidth=5.0, delta_f=7.5, cp_type="extended")
    assert c2.cp_duration_us == 33.0


def test_invalid_modulation():
    with pytest.raises(ValueError):
        LTEConfig(modulation="256-QAM")


def test_hashable_static():
    assert hash(LTEConfig()) == hash(LTEConfig())
    assert LTEConfig() == LTEConfig(bandwidth=5.0)


def test_matmul_precision_knob(monkeypatch):
    import jax
    from ofdm_lte_tpu.precision import matmul_precision
    monkeypatch.delenv("OFDM_LTE_TPU_MATMUL_PRECISION", raising=False)
    # supported default: single-pass bf16 (BER-identical to highest on
    # chip, 1.8x faster — VALIDATION.md precision table); inert on CPU
    assert matmul_precision() == jax.lax.Precision.DEFAULT
    monkeypatch.setenv("OFDM_LTE_TPU_MATMUL_PRECISION", "highest")
    assert matmul_precision() == jax.lax.Precision.HIGHEST  # parity mode
    monkeypatch.setenv("OFDM_LTE_TPU_MATMUL_PRECISION", "bogus")
    import pytest
    with pytest.raises(ValueError):
        matmul_precision()
