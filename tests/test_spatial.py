"""Beamforming and TM4 spatial-multiplexing end-to-end pipelines."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.sim import beamforming as bfs
from ofdm_lte_tpu.sim import spatial


def _bits(cfg, n_sym, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2,
                        bfs.bits_per_frame(cfg, n_sym)).astype(np.int32)


def test_beamforming_high_snr_zero_ber():
    cfg = LTEConfig(bandwidth=5.0, modulation="64-QAM")
    bits = _bits(cfg, 14)
    r = bfs.simulate_beamforming(jax.random.PRNGKey(0), jnp.asarray(bits),
                                 60.0, cfg, num_tx=2, num_rx=1)
    assert float(r.ber) == 0.0


@pytest.mark.parametrize("num_tx", [2, 4, 8])
def test_beamforming_array_gain_grows(num_tx):
    """MRT array gain ≈ 10·log10(num_tx) dB on average
    (resultados_comparacion.txt: 3.01/6.02/9.03 dB for 2/4/8 TX)."""
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    gains = []
    for s in range(12):
        bits = _bits(cfg, 1, seed=s)
        r = bfs.simulate_beamforming(jax.random.PRNGKey(s),
                                     jnp.asarray(bits), 15.0, cfg,
                                     num_tx=num_tx, num_rx=1)
        gains.append(float(r.beamforming_gain_db))
    mean_gain = np.mean(gains)
    expected = 10 * np.log10(num_tx)
    assert abs(mean_gain - expected) < 1.8, (mean_gain, expected)


def test_beamforming_beats_low_snr_without_it():
    """At moderate SNR, 8-TX beamforming has far fewer errors than 2-TX
    (reference table: BER 3.4e-2 @2x1 vs 1.2e-4 @8x1, SNR 15 dB 64-QAM)."""
    cfg = LTEConfig(bandwidth=5.0, modulation="64-QAM")
    errs = {}
    for num_tx in (2, 8):
        e = t = 0
        for s in range(6):
            bits = _bits(cfg, 14, seed=s)
            r = bfs.simulate_beamforming(jax.random.PRNGKey(s),
                                         jnp.asarray(bits), 15.0, cfg,
                                         num_tx=num_tx, num_rx=1)
            e += int(r.bit_errors)
            t += len(bits)
        errs[num_tx] = e / t
    assert errs[8] < errs[2] / 5, errs


def test_beamforming_codebook_mode_runs():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    bits = _bits(cfg, 14)
    r = bfs.simulate_beamforming(jax.random.PRNGKey(0), jnp.asarray(bits),
                                 10.0, cfg, num_tx=4, num_rx=2,
                                 codebook_type="TM6", update_mode="static")
    assert 0.0 <= float(r.ber) < 0.5
    assert 0 <= int(r.pmi) < 16


@pytest.mark.parametrize("det", ["MMSE", "ZF", "SIC"])
def test_spatial_2x2_high_snr(det):
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    bits = _bits(cfg, 14)
    r = spatial.simulate_spatial_multiplexing(
        jax.random.PRNGKey(0), jnp.asarray(bits), 45.0, cfg,
        num_tx=2, num_rx=2, rank=2, detector_type=det)
    assert float(r.ber) < 0.01, (det, float(r.ber))


def test_spatial_rank1_mrc():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    bits = _bits(cfg, 14)
    r = spatial.simulate_spatial_multiplexing(
        jax.random.PRNGKey(0), jnp.asarray(bits), 40.0, cfg,
        num_tx=2, num_rx=2, rank=1, detector_type="MRC")
    assert float(r.ber) < 0.01


def test_spatial_adaptive_rank_runs():
    cfg = LTEConfig(bandwidth=5.0, modulation="64-QAM")
    bits = _bits(cfg, 14)
    r = spatial.simulate_spatial_multiplexing(
        jax.random.PRNGKey(1), jnp.asarray(bits), 25.0, cfg,
        num_tx=4, num_rx=2, rank="adaptive", detector_type="MMSE")
    assert 0.0 <= float(r.ber) < 0.6


def test_spatial_4x4_rank4():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    bits = _bits(cfg, 14)
    r = spatial.simulate_spatial_multiplexing(
        jax.random.PRNGKey(2), jnp.asarray(bits), 45.0, cfg,
        num_tx=4, num_rx=4, rank=4, detector_type="MMSE")
    assert float(r.ber) < 0.05, float(r.ber)


def test_batched_lanes_per_lane_snr():
    """Monte-Carlo leading axes + per-lane SNR through spatial/beamforming
    (regression: σ² alignment against appended matrix axes)."""
    import jax.numpy as jnp
    cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
    lanes = 3
    bits = np.random.default_rng(0).integers(
        0, 2, (lanes, spatial.bits_per_frame(cfg, 14))).astype(np.int32)
    snrs = jnp.asarray([0.0, 15.0, 60.0])
    for det in ("MMSE", "SIC"):
        r = spatial.simulate_spatial_multiplexing(
            jax.random.PRNGKey(0), jnp.asarray(bits), snrs, cfg,
            num_tx=2, num_rx=2, rank=2, detector_type=det)
        b = np.asarray(r.ber)
        assert b.shape == (lanes,) and b[0] > b[2]
    rb = bfs.simulate_beamforming(jax.random.PRNGKey(0), jnp.asarray(bits),
                                  snrs, cfg, num_tx=4, num_rx=2)
    b = np.asarray(rb.ber)
    assert b.shape == (lanes,) and b[0] > b[2] == 0.0


def test_spatial_sic_beats_zf_at_moderate_snr():
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    e = {"ZF": 0, "SIC": 0}
    t = 0
    for s in range(4):
        bits = _bits(cfg, 14, seed=s)
        for det in ("ZF", "SIC"):
            r = spatial.simulate_spatial_multiplexing(
                jax.random.PRNGKey(s), jnp.asarray(bits), 18.0, cfg,
                num_tx=2, num_rx=2, rank=2, detector_type=det)
            e[det] += int(r.bit_errors)
        t += len(bits)
    assert e["SIC"] <= e["ZF"] * 1.1, e
