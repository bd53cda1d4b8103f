"""TS 36.212 channel-coding chain: parity with the reference implementation."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_lte_tpu.coding import crc, segmentation, turbo, rate_matching

sys.path.insert(0, "/root/reference")


# ---------------------------------------------------------------------------
# CRC
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [6, 40, 100, 1000])
def test_crc_matches_reference(n, rng):
    from core.channel_coding.crc import (calculate_crc24a, calculate_crc24b,
                                         calculate_crc16)
    bits = rng.integers(0, 2, n).astype(np.uint8)
    np.testing.assert_array_equal(crc.calculate_crc24a(bits),
                                  calculate_crc24a(bits))
    np.testing.assert_array_equal(crc.calculate_crc24b(bits),
                                  calculate_crc24b(bits))
    np.testing.assert_array_equal(crc.calculate_crc16(bits),
                                  calculate_crc16(bits))


def test_crc_attach_check_roundtrip(rng):
    bits = rng.integers(0, 2, 200).astype(np.uint8)
    wc = crc.attach_crc24a(bits)
    assert crc.check_crc24a(wc)
    bad = wc.copy()
    bad[17] ^= 1
    assert not crc.check_crc24a(bad)


def test_crc_jax_matches_host(rng):
    bits = rng.integers(0, 2, 300).astype(np.int32)
    got = np.asarray(crc.crc_jax(jnp.asarray(bits)))
    ref = crc.calculate_crc24a(bits)
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------

def test_interleaver_size_table_matches_reference():
    from core.channel_coding.segmentation import TURBO_INTERLEAVER_SIZES as REF
    assert list(segmentation.TURBO_INTERLEAVER_SIZES) == list(REF)


@pytest.mark.parametrize("n", [100, 6120, 6200, 20000])
def test_segmentation_matches_reference(n, rng):
    import io
    from contextlib import redirect_stdout
    from core.channel_coding.segmentation import (
        segment_code_blocks as ref_seg, desegment_code_blocks as ref_deseg)
    tb = rng.integers(0, 2, n).astype(np.uint8)
    with redirect_stdout(io.StringIO()):
        ref_blocks, ref_meta = ref_seg(tb)
    blocks, meta = segmentation.segment_code_blocks(tb)
    assert meta["num_blocks"] == ref_meta["num_blocks"]
    assert meta["block_sizes"] == ref_meta["block_sizes"]
    for b, rb in zip(blocks, ref_blocks):
        np.testing.assert_array_equal(b, rb)
    back = segmentation.desegment_code_blocks(blocks, meta)
    np.testing.assert_array_equal(back, tb)


# ---------------------------------------------------------------------------
# Turbo encoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("K", [40, 104, 512, 1024])
def test_qpp_matches_reference(K):
    from core.channel_coding.turbo_encoder import qpp_interleave as ref_qpp
    data = np.arange(K, dtype=np.int32)
    ref = ref_qpp(data, K)
    got = np.asarray(turbo.qpp_interleave(jnp.asarray(data), K))
    np.testing.assert_array_equal(got, ref)
    # inverse
    back = np.asarray(turbo.qpp_deinterleave(jnp.asarray(got), K))
    np.testing.assert_array_equal(back, data)


@pytest.mark.parametrize("K", [40, 104, 512])
def test_turbo_encode_matches_reference(K, rng):
    from core.channel_coding.turbo_encoder import turbo_encode as ref_enc
    bits = rng.integers(0, 2, K).astype(np.uint8)
    ref = ref_enc(bits)
    got = np.asarray(turbo.turbo_encode(jnp.asarray(bits.astype(np.int32)), K))
    np.testing.assert_array_equal(got, ref)


def test_turbo_encode_batched(rng):
    K = 64
    bits = rng.integers(0, 2, (5, K)).astype(np.int32)
    enc = np.asarray(turbo.turbo_encode(jnp.asarray(bits), K))
    assert enc.shape == (5, 3 * K + 12)
    from core.channel_coding.turbo_encoder import turbo_encode as ref_enc
    for i in range(5):
        np.testing.assert_array_equal(enc[i], ref_enc(bits[i].astype(np.uint8)))


# ---------------------------------------------------------------------------
# Rate matching
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("K,E", [(40, 132), (40, 50), (40, 200), (104, 324)])
def test_rate_match_matches_reference(K, E, rng):
    from core.channel_coding.rate_matching import rate_match_turbo as ref_rm
    encoded = rng.integers(0, 2, 3 * K + 12).astype(np.uint8)
    ref = ref_rm(encoded, E, K, rv_idx=0)
    got = np.asarray(rate_matching.rate_match(
        jnp.asarray(encoded.astype(np.int32)), E, K, 0))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("rv", [0, 1, 2, 3])
def test_rate_match_rv_matches_reference(rv, rng):
    from core.channel_coding.rate_matching import rate_match_turbo as ref_rm
    K, E = 64, 3 * 64 + 12
    encoded = rng.integers(0, 2, 3 * K + 12).astype(np.uint8)
    ref = ref_rm(encoded, E, K, rv_idx=rv)
    got = np.asarray(rate_matching.rate_match(
        jnp.asarray(encoded.astype(np.int32)), E, K, rv))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("K,E", [(40, 132), (104, 324), (64, 150)])
def test_rate_dematch_matches_reference(K, E, rng):
    from core.channel_coding.rate_matching import rate_dematching_turbo as ref_dm
    llrs = rng.standard_normal(E)
    ref = ref_dm(llrs, K, rv_idx=0)
    got = np.asarray(rate_matching.rate_dematch(
        jnp.asarray(llrs.astype(np.float32)), K, 0))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_rate_match_dematch_roundtrip(rng):
    """Full-rate E: de-matched LLR signs reproduce the encoded bits."""
    K = 104
    E = 3 * K + 12
    bits = rng.integers(0, 2, K).astype(np.int32)
    enc = np.asarray(turbo.turbo_encode(jnp.asarray(bits), K))
    rm = rate_matching.rate_match(jnp.asarray(enc), E, K, 0)
    llrs = jnp.where(rm == 0, 10.0, -10.0)
    dem = np.asarray(rate_matching.rate_dematch(llrs, K, 0))
    hard = (dem < 0).astype(np.int32)
    recovered = dem != 0
    np.testing.assert_array_equal(hard[recovered],
                                  enc[np.asarray(recovered)])


# ---------------------------------------------------------------------------
# Turbo decoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("K", [40, 104, 512])
def test_turbo_decode_noiseless(K, rng):
    bits = rng.integers(0, 2, K).astype(np.int32)
    enc = turbo.turbo_encode(jnp.asarray(bits), K)
    llrs = jnp.where(enc == 0, 10.0, -10.0).astype(jnp.float32)
    dec = np.asarray(turbo.turbo_decode(llrs, K, num_iterations=4))
    np.testing.assert_array_equal(dec, bits)


def test_turbo_decode_batched_noisy(rng):
    """Coding gain in the codec's working regime: raw BER ~8% (σ=0.7)
    decodes to ~0. NOTE the reference's codec family (systematic output =
    feedback bit, turbo_encoder.py:174-189) collapses for σ ≥ ~0.9 — our
    decoder reproduces that behavior bit-for-bit (see the parity test
    below), so the anchor uses the regime where the reference works."""
    K = 512
    B = 4
    bits = rng.integers(0, 2, (B, K)).astype(np.int32)
    enc = np.asarray(turbo.turbo_encode(jnp.asarray(bits), K)).astype(float)
    x = 1.0 - 2.0 * enc                       # BPSK
    sigma = 0.55
    y = x + sigma * rng.standard_normal(x.shape)
    raw_ber = np.mean((y < 0) != enc.astype(bool))
    llr = jnp.asarray(2.0 * y / sigma ** 2, jnp.float32)
    dec = np.asarray(turbo.turbo_decode(llr, K, num_iterations=6))
    ber = np.mean(dec != bits)
    assert raw_ber > 0.015
    assert ber < 0.003, ber


def test_turbo_decode_matches_reference_decoder(rng):
    """Same LLR input -> same hard output as the reference max-log decoder."""
    from core.channel_coding import turbo_decoder as ref_td
    ref_td.USE_MAX_LOG_MAP = True
    K = 40
    bits = rng.integers(0, 2, K).astype(np.int32)
    enc = np.asarray(turbo.turbo_encode(jnp.asarray(bits), K)).astype(float)
    x = 1.0 - 2.0 * enc
    y = x + 0.5 * rng.standard_normal(x.shape)
    llr = 2.0 * y / 0.25
    ref = ref_td.turbo_decode(llr, K, num_iterations=3)
    got = np.asarray(turbo.turbo_decode(jnp.asarray(llr, jnp.float32), K,
                                        num_iterations=3))
    np.testing.assert_array_equal(got, ref)


def test_turbo_decode_logmap_matches_reference(rng):
    """Exact Log-MAP mode (USE_MAX_LOG_MAP=False): same hard output as the
    reference's max* = log-sum-exp decoder (turbo_decoder.py:92-115) on
    identical LLRs, via both the assoc-scan and sequential-scan kernels."""
    from core.channel_coding import turbo_decoder as ref_td
    ref_td.USE_MAX_LOG_MAP = False
    try:
        K = 40
        bits = rng.integers(0, 2, K).astype(np.int32)
        enc = np.asarray(turbo.turbo_encode(jnp.asarray(bits), K)
                         ).astype(float)
        y = 1.0 - 2.0 * enc + 0.5 * rng.standard_normal(enc.shape)
        llr = 2.0 * y / 0.25
        ref = ref_td.turbo_decode(llr, K, num_iterations=3)
    finally:
        ref_td.USE_MAX_LOG_MAP = True
    got = np.asarray(turbo.turbo_decode(jnp.asarray(llr, jnp.float32), K,
                                        num_iterations=3, use_max_log=False))
    np.testing.assert_array_equal(got, ref)
    os.environ["OFDM_LTE_TPU_BCJR"] = "scan"
    try:
        got_scan = np.asarray(turbo.turbo_decode(
            jnp.asarray(llr, jnp.float32), K, num_iterations=3,
            use_max_log=False))
    finally:
        del os.environ["OFDM_LTE_TPU_BCJR"]
    np.testing.assert_array_equal(got_scan, ref)


def test_turbo_decode_matches_reference_at_max_K(rng):
    """Hard-output parity at the LARGEST interleaver size (K=6144) in both
    semirings — the float32 assoc-scan prefix products round differently
    from the reference's float64 sequential max*, so agreement at K=40 does
    not by itself establish it at 6144 (PARITY.md's claim)."""
    from core.channel_coding import turbo_decoder as ref_td
    K = 6144
    bits = rng.integers(0, 2, K).astype(np.int32)
    enc = np.asarray(turbo.turbo_encode(jnp.asarray(bits), K)).astype(float)
    y = 1.0 - 2.0 * enc + 0.5 * rng.standard_normal(enc.shape)
    llr = 2.0 * y / 0.25
    for use_max_log in (True, False):
        ref_td.USE_MAX_LOG_MAP = use_max_log
        try:
            ref = ref_td.turbo_decode(llr, K, num_iterations=2)
        finally:
            ref_td.USE_MAX_LOG_MAP = True
        got = np.asarray(turbo.turbo_decode(jnp.asarray(llr, jnp.float32),
                                            K, num_iterations=2,
                                            use_max_log=use_max_log))
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("K", [40, 512])
# slow lane: the block-impl is still parity-guarded by
# test_turbo_decode_block_impl_matches_reference_at_max_K in the default run
@pytest.mark.slow
def test_turbo_decode_block_impl_parity(K, rng):
    """'block' (the TPU-default blocked-scan BCJR) vs 'scan' (float-faithful
    sequential kernel): LLRs agree to float-reassociation tolerance and hard
    outputs are identical on a real noisy codeword, in both semirings. The
    CPU default is 'scan', so the block kernel needs explicit coverage.
    K=40 exercises the single-chunk case (K' < L: the whole trellis lives in
    one padded block and only the identity-padded tail logic runs)."""
    Kp = K + 3
    bits = rng.integers(0, 2, (4, K)).astype(np.int32)
    enc = np.asarray(turbo.turbo_encode(jnp.asarray(bits), K)).astype(
        np.float32)
    y = 1.0 - 2.0 * enc + 0.5 * rng.standard_normal(enc.shape).astype(
        np.float32)
    llr = jnp.asarray(2.0 * y / 0.25)
    for use_max_log in (True, False):
        ls, lp = llr[..., :Kp], llr[..., Kp:2 * Kp]
        la = jnp.zeros_like(ls)
        out_s = np.asarray(turbo._bcjr(ls, lp, la, impl="scan",
                                       use_max_log=use_max_log))
        out_b = np.asarray(turbo._bcjr(ls, lp, la, impl="block",
                                       use_max_log=use_max_log))
        assert np.max(np.abs(out_b - out_s)) < 0.05   # reassociation only
        os.environ["OFDM_LTE_TPU_BCJR"] = "block"
        try:
            got_b = np.asarray(turbo.turbo_decode(
                llr, K, num_iterations=3, use_max_log=use_max_log))
        finally:
            del os.environ["OFDM_LTE_TPU_BCJR"]
        got_s = np.asarray(turbo.turbo_decode(
            llr, K, num_iterations=3, use_max_log=use_max_log))
        np.testing.assert_array_equal(got_b, got_s)
        np.testing.assert_array_equal(got_b, bits)


def test_turbo_decode_block_impl_matches_reference_at_max_K(rng):
    """Hard-output parity of the 'block' kernel against the reference
    decoder at K=6144 (max-log, 2 iterations) — the TPU default path must
    hold the same reference-parity claim as 'scan'/'assoc' (PARITY.md)."""
    from core.channel_coding import turbo_decoder as ref_td
    K = 6144
    bits = rng.integers(0, 2, K).astype(np.int32)
    enc = np.asarray(turbo.turbo_encode(jnp.asarray(bits), K)).astype(float)
    y = 1.0 - 2.0 * enc + 0.5 * rng.standard_normal(enc.shape)
    llr = 2.0 * y / 0.25
    ref = ref_td.turbo_decode(llr, K, num_iterations=2)
    os.environ["OFDM_LTE_TPU_BCJR"] = "block"
    try:
        got = np.asarray(turbo.turbo_decode(jnp.asarray(llr, jnp.float32),
                                            K, num_iterations=2))
    finally:
        del os.environ["OFDM_LTE_TPU_BCJR"]
    np.testing.assert_array_equal(got, ref)


def test_set_decoder_mode_global_switch():
    """set_decoder_mode flips the module default like the reference's
    global USE_MAX_LOG_MAP (turbo_decoder.py:35-55)."""
    assert turbo.USE_MAX_LOG_MAP is True
    turbo.set_decoder_mode(False)
    try:
        assert turbo.USE_MAX_LOG_MAP is False
    finally:
        turbo.set_decoder_mode(True)
    assert turbo.USE_MAX_LOG_MAP is True
