"""End-to-end turbo-coded SISO chain."""
import numpy as np
import jax
import pytest

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.sim import coded


def test_coded_high_snr_perfect():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 3000).astype(np.uint8)
    r = coded.simulate_siso_coded(jax.random.PRNGKey(0), bits, 30.0, cfg)
    assert r.crc_pass
    assert r.ber == 0.0
    assert r.coded_bits_length > 3 * len(bits)   # rate 1/3 + overhead


def test_coded_multi_block_segmentation():
    """Transport block > 6144 -> multiple code blocks with CRC-24B."""
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 15000).astype(np.uint8)
    r = coded.simulate_siso_coded(jax.random.PRNGKey(1), bits, 30.0, cfg)
    assert r.crc_pass and r.ber == 0.0


def test_coded_beats_uncoded_at_moderate_snr():
    """Coding gain: at QPSK SNR 5 dB (uncoded BER ~2-3%), the turbo chain
    decodes to zero errors (cf. test_coded_image_comparison.py scenarios)."""
    from ofdm_lte_tpu.sim import siso
    import jax.numpy as jnp
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 6000).astype(np.uint8)
    r = coded.simulate_siso_coded(jax.random.PRNGKey(2), bits, 5.0, cfg)
    # uncoded at same SNR for contrast
    ub = siso.pad_bits(bits, cfg)
    ru = siso.simulate_siso(jax.random.PRNGKey(2), jnp.asarray(ub), 5.0, cfg)
    assert float(ru.ber) > 0.005
    assert r.ber < 0.002, r.ber
    assert r.crc_pass


def test_coded_16qam_runs():
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 4000).astype(np.uint8)
    r = coded.simulate_siso_coded(jax.random.PRNGKey(3), bits, 25.0, cfg)
    assert r.crc_pass and r.ber == 0.0


def test_coded_rayleigh_runs():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 4000).astype(np.uint8)
    r = coded.simulate_siso_coded(jax.random.PRNGKey(4), bits, 18.0, cfg,
                                  channel_type="rayleigh_mp",
                                  itu_profile="Pedestrian_A",
                                  velocity_kmh=3.0)
    assert r.ber < 0.2


def test_coded_crc_fails_on_heavy_noise():
    cfg = LTEConfig(bandwidth=5.0, modulation="64-QAM")
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 4000).astype(np.uint8)
    r = coded.simulate_siso_coded(jax.random.PRNGKey(5), bits, -5.0, cfg)
    assert not r.crc_pass
    assert r.ber > 0.05
