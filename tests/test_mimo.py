"""MIMO stack: codebooks (parity with reference), layer mapper, detectors,
beamforming, CSI, rank adaptation."""
import io
import sys
from contextlib import redirect_stdout

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_lte_tpu import cplx
from ofdm_lte_tpu.mimo import (codebook as cb, layer_mapper, detector,
                               beamforming as bf, csi, rank_adaptation as ra)
from ofdm_lte_tpu.ops import qam


def _ref_codebook(num_tx, mode, rank):
    sys.path.insert(0, "/root/reference")
    from core.codebook_lte import LTECodebook
    with redirect_stdout(io.StringIO()):
        ref = LTECodebook(num_tx, transmission_mode=mode, rank=rank)
    return [np.asarray(w, complex) for w in ref.get_codebook()]


@pytest.mark.parametrize("num_tx,mode,rank", [
    (2, "TM6", 1), (4, "TM6", 1), (8, "TM6", 1),
    (2, "TM4", 1), (2, "TM4", 2),
    (4, "TM4", 2), (4, "TM4", 3), (4, "TM4", 4),
    (8, "TM4", 2), (8, "TM4", 3), (8, "TM4", 4),
])
def test_codebook_matches_reference(num_tx, mode, rank):
    ours = cb.codebook(num_tx, mode, rank)
    ref = _ref_codebook(num_tx, mode, rank)
    assert len(ours) == len(ref)
    for w_ours, w_ref in zip(ours, ref):
        np.testing.assert_allclose(w_ours, w_ref, atol=1e-12)


def test_select_best_pmi_matches_reference(rng):
    sys.path.insert(0, "/root/reference")
    from core.codebook_lte import LTECodebook
    for num_tx in (2, 4, 8):
        H = rng.standard_normal((2, num_tx)) + 1j * rng.standard_normal((2, num_tx))
        with redirect_stdout(io.StringIO()):
            ref = LTECodebook(num_tx, transmission_mode="TM6")
        ref_pmi, _ = ref.select_best_pmi(H, metric="capacity")
        pmi, _ = cb.select_best_pmi(cplx.from_numpy(H), num_tx, "TM6", 1)
        assert int(pmi) == ref_pmi


def test_layer_mapper_roundtrip(rng):
    for L in (1, 2, 3, 4):
        n = 24
        s = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        lay = layer_mapper.map_to_layers(cplx.from_numpy(s), L)
        assert lay.shape == (L, n // L) if n % L == 0 else True
        back = layer_mapper.demap_from_layers(lay, original_length=n)
        np.testing.assert_allclose(back.to_numpy(), s, atol=1e-6)


def test_layer_mapper_round_robin():
    """symbols [s0..s5], L=2 -> layer0=[s0,s2,s4], layer1=[s1,s3,s5]
    (layer_mapper.py:35-83)."""
    s = np.arange(6).astype(complex)
    lay = layer_mapper.map_to_layers(cplx.from_numpy(s), 2).to_numpy()
    np.testing.assert_allclose(lay[0], [0, 2, 4])
    np.testing.assert_allclose(lay[1], [1, 3, 5])


@pytest.mark.parametrize("det", ["MMSE", "ZF"])
def test_detector_matches_reference(det, rng):
    sys.path.insert(0, "/root/reference")
    from core.mimo_detector import MIMODetector
    H = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    s = np.array([1 + 1j, -1 + 1j]) / np.sqrt(2)
    y = H @ s + 0.05 * (rng.standard_normal(2) + 1j * rng.standard_normal(2))
    with redirect_stdout(io.StringIO()):
        ref_det = MIMODetector(2, 2, detector_type=det)
        s_ref = ref_det.detect(y, H, noise_variance=0.01)
    s_ours = detector.detect(cplx.from_numpy(y), cplx.from_numpy(H),
                             0.01, detector_type=det).to_numpy()
    np.testing.assert_allclose(s_ours, s_ref, atol=1e-4)


def test_detector_batched_over_subcarriers(rng):
    n_sc = 16
    H = rng.standard_normal((n_sc, 2, 2)) + 1j * rng.standard_normal((n_sc, 2, 2))
    s = (rng.standard_normal((n_sc, 2)) + 1j * rng.standard_normal((n_sc, 2)))
    y = np.einsum("krt,kt->kr", H, s)
    out = detector.detect(cplx.from_numpy(y), cplx.from_numpy(H),
                          1e-6, "MMSE").to_numpy()
    np.testing.assert_allclose(out, s, atol=1e-3)


def test_sic_perfect_cancellation(rng):
    """Noiseless QPSK, well-conditioned H -> SIC recovers exactly."""
    n_sc = 32
    bits = np.random.default_rng(0).integers(0, 2, (n_sc, 2, 2))
    s = qam.modulate(jnp.asarray(bits.reshape(n_sc, 4)), "QPSK").to_numpy()
    H = np.stack([np.eye(2) + 0.3 * (rng.standard_normal((2, 2))
                                     + 1j * rng.standard_normal((2, 2)))
                  for _ in range(n_sc)])
    y = np.einsum("krt,kt->kr", H, s)
    out = detector.detect(cplx.from_numpy(y), cplx.from_numpy(H), 1e-4,
                          "SIC", modulation="QPSK").to_numpy()
    np.testing.assert_allclose(out, s, atol=1e-4)


def test_mrt_weights_match_reference(rng):
    sys.path.insert(0, "/root/reference")
    from core.beamforming_precoder import BeamformingPrecoder
    H = rng.standard_normal((2, 4)) + 1j * rng.standard_normal((2, 4))
    with redirect_stdout(io.StringIO()):
        ref = BeamformingPrecoder(4).calculate_mrt_weights(H)
    ours = bf.mrt_weights(cplx.from_numpy(H)).to_numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_eigen_weights_dominant(rng):
    H = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    w = bf.eigen_weights(cplx.from_numpy(H)).to_numpy()[:, 0]
    A = H.conj().T @ H
    ev, vecs = np.linalg.eigh(A)
    v_ref = vecs[:, -1]
    # eigenvectors defined up to phase: |<w, v_ref>| == 1
    assert np.isclose(abs(np.vdot(w, v_ref)), 1.0, atol=1e-4)


def test_update_period_matches_reference():
    sys.path.insert(0, "/root/reference")
    from core.beamforming_precoder import AdaptiveBeamforming
    for v in (3.0, 30.0, 120.0):
        with redirect_stdout(io.StringIO()):
            ref = AdaptiveBeamforming(2, velocity_kmh=v, frequency_ghz=2.0)
        assert bf.update_period_symbols(v, 2.0) == ref.update_period


def test_cqi_table_matches_reference():
    sys.path.insert(0, "/root/reference")
    from core.csi_feedback import CSIFeedback
    with redirect_stdout(io.StringIO()):
        ref = CSIFeedback(2, 2)
    for sinr in [-10, -5.5, -3.1, 0.0, 1.9, 7.3, 13.0, 19.9, 25.0]:
        ours = int(csi.sinr_to_cqi(jnp.asarray(float(sinr))))
        assert ours == ref._sinr_to_cqi(sinr), sinr


def test_rank_indicator_matches_reference(rng):
    sys.path.insert(0, "/root/reference")
    from core.csi_feedback import CSIFeedback
    with redirect_stdout(io.StringIO()):
        ref = CSIFeedback(4, 2)
    for _ in range(5):
        H = rng.standard_normal((2, 4)) + 1j * rng.standard_normal((2, 4))
        assert int(csi.rank_indicator(cplx.from_numpy(H))) == \
            ref.calculate_rank_indicator(H)


def test_rank_adaptation_matches_reference(rng):
    sys.path.insert(0, "/root/reference")
    from core.rank_adaptation import RankAdaptation
    for snr in (3.0, 8.0, 15.0, 25.0):
        with redirect_stdout(io.StringIO()):
            ref = RankAdaptation(4, 4, snr_db=snr)
        for _ in range(3):
            H = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
            with redirect_stdout(io.StringIO()):
                ri_ref = ref.calculate_optimal_rank(H)
                pmi_ref, W_ref = ref.select_precoder_for_rank(H, ri_ref)
            assert ra.optimal_rank(H, snr) == ri_ref
            pmi, W = ra.select_precoder_for_rank(H, ri_ref, snr)
            if pmi != pmi_ref:
                # ties to machine precision are broken differently (the
                # reference compares complex log-dets whose ~1e-15 imaginary
                # parts decide); accept any equal-capacity precoder
                snr_lin = 10 ** (snr / 10)

                def cap(Wx):
                    He = H @ Wx
                    M = np.eye(4) + (snr_lin / ri_ref) * (He @ He.conj().T)
                    return np.linalg.slogdet(M)[1] / np.log(2)

                assert np.isclose(cap(W), cap(W_ref), rtol=1e-9)
            else:
                np.testing.assert_allclose(W, W_ref, atol=1e-12)


def test_pmi_statistics_matches_reference_semantics():
    # reference: CSIFeedback.get_statistics (csi_feedback.py:192-206)
    hist = [0, 2, 2, 3, 2, 0]
    s = csi.pmi_statistics(hist, num_tx=2, codebook_type="TM6")
    assert s["total_feedbacks"] == 6
    assert s["unique_pmis"] == 3
    assert s["most_common_pmi"] == 2
    assert list(s["pmi_distribution"]) == [2, 0, 3, 1]   # size-4 TM6 2TX
    assert csi.pmi_statistics([], num_tx=2) is None


def test_pmi_statistics_from_simulation(rng):
    from ofdm_lte_tpu.sim import beamforming as bsim
    from ofdm_lte_tpu import LTEConfig
    cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
    n = bsim.bits_per_frame(cfg, 2)
    bits = jnp.asarray(rng.integers(0, 2, (8, n)).astype(np.int32))
    r = bsim.simulate_beamforming(jax.random.PRNGKey(3), bits, 20.0, cfg,
                                  num_tx=2, num_rx=1, update_mode="static")
    s = csi.pmi_statistics(r.pmi, num_tx=2)
    assert s["total_feedbacks"] == 8
    assert s["pmi_distribution"].sum() == 8


# slow lane: MMSE-U correctness is also covered by the cheap
# mmse_unbiased unit checks
@pytest.mark.slow
def test_unbiased_mmse_beats_biased_on_multiring_qam():
    """MMSE-U (capability extension, PARITY.md): dividing each layer by
    its bias b_i = 1 - sigma^2*[(G+sigma^2 I)^-1]_ii must cut errors vs
    the reference's biased MMSE on multi-ring QAM (the shrinkage pushes
    outer constellation points toward decision boundaries), and must be
    EXACTLY the biased result on QPSK (a positive real per-layer scale
    cannot change a sign decision)."""
    import jax
    from ofdm_lte_tpu.parallel import sweep
    from ofdm_lte_tpu import LTEConfig

    cfg = LTEConfig(bandwidth=1.25, modulation="16-QAM")
    errs = {}
    for det in ("MMSE", "MMSE-U"):
        r = sweep.ber_sweep(jax.random.PRNGKey(5), cfg, [14.0, 18.0],
                            frames_per_device=2, num_ofdm_symbols=14,
                            pipeline="spatial", num_tx=2, num_rx=2,
                            detector_type=det, rank=2)
        errs[det] = int(np.asarray(r.bit_errors, np.int64).sum())
    assert errs["MMSE-U"] < errs["MMSE"], errs

    cfgq = LTEConfig(bandwidth=1.25, modulation="QPSK")
    eq = {}
    for det in ("MMSE", "MMSE-U"):
        r = sweep.ber_sweep(jax.random.PRNGKey(5), cfgq, [10.0],
                            frames_per_device=1, num_ofdm_symbols=14,
                            pipeline="spatial", num_tx=2, num_rx=2,
                            detector_type=det, rank=2)
        eq[det] = int(np.asarray(r.bit_errors, np.int64).sum())
    assert eq["MMSE"] == eq["MMSE-U"], eq
