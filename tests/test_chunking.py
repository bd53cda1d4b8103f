"""Lane-chunked execution (parallel/chunking.lane_chunked): shape fidelity
and distributional equivalence with the unchunked batched call, in both
execution modes (unroll = independent subgraphs, scan = lax.map)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.parallel.chunking import lane_chunked
from ofdm_lte_tpu.sim import siso, diversity


@pytest.mark.parametrize("mode", ["unroll", "scan"])
def test_chunked_siso_shapes_and_stats(mode):
    cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
    lanes, chunk = 8, 4
    n = siso.bits_per_frame(cfg, 14)
    bits = jnp.asarray(np.random.default_rng(0).integers(
        0, 2, (lanes, n)).astype(np.int32))
    snr = jnp.full((lanes,), 6.0, jnp.float32)

    plain = siso.simulate_siso(jax.random.PRNGKey(0), bits, snr, cfg)
    chunked = lane_chunked(
        lambda k, b, s, c: siso.simulate_siso(k, b, s, c), chunk,
        mode=mode)(jax.random.PRNGKey(0), bits, snr, cfg)

    assert chunked.bit_errors.shape == plain.bit_errors.shape == (lanes,)
    assert chunked.bits_rx.shape == plain.bits_rx.shape
    # different key-split structure -> different draws, same distribution
    b_plain = float(jnp.sum(plain.bit_errors)) / (lanes * n)
    b_chunk = float(jnp.sum(chunked.bit_errors)) / (lanes * n)
    assert abs(b_plain - b_chunk) < 0.02, (b_plain, b_chunk)
    # per-lane SNR routing survives chunking: 60 dB lanes are error-free
    snr_mix = jnp.asarray([6.0, 60.0] * 4, jnp.float32)
    r = lane_chunked(
        lambda k, b, s, c: siso.simulate_siso(k, b, s, c), chunk,
        mode=mode)(jax.random.PRNGKey(1), bits, snr_mix, cfg)
    errs = np.asarray(r.bit_errors)
    assert np.all(errs[1::2] == 0) and np.all(errs[0::2] > 0), errs


@pytest.mark.parametrize("mode", ["unroll", "scan"])
def test_chunked_sfbc_equivalence(mode):
    cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
    lanes, chunk = 4, 2
    n = diversity.sfbc_bits_per_frame(cfg, 14)
    bits = jnp.asarray(np.random.default_rng(1).integers(
        0, 2, (lanes, n)).astype(np.int32))
    snr = jnp.full((lanes,), 60.0, jnp.float32)

    fn = lambda k, b, s, c: diversity.simulate_sfbc(   # noqa: E731
        k, b, s, c, num_rx=1)
    r = lane_chunked(fn, chunk, mode=mode)(
        jax.random.PRNGKey(2), bits, snr, cfg)
    assert r.bit_errors.shape == (lanes,)
    assert int(jnp.sum(r.bit_errors)) == 0      # 60 dB: error-free


def test_chunked_modes_agree_under_jit():
    """Both modes produce identical per-lane results for the SAME keys:
    the key-split structure is shared (split(key, n) per chunk), so
    unroll vs scan is purely an execution-strategy choice."""
    cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
    lanes, chunk = 8, 4
    n = siso.bits_per_frame(cfg, 14)
    bits = jnp.asarray(np.random.default_rng(5).integers(
        0, 2, (lanes, n)).astype(np.int32))
    snr = jnp.full((lanes,), 8.0, jnp.float32)
    fn = lambda k, b, s, c: siso.simulate_siso(k, b, s, c)  # noqa: E731
    key = jax.random.PRNGKey(9)
    r_u = jax.jit(lane_chunked(fn, chunk, mode="unroll"),
                  static_argnums=(3,))(key, bits, snr, cfg)
    r_s = jax.jit(lane_chunked(fn, chunk, mode="scan"),
                  static_argnums=(3,))(key, bits, snr, cfg)
    np.testing.assert_array_equal(np.asarray(r_u.bit_errors),
                                  np.asarray(r_s.bit_errors))


def test_chunked_fallback_paths():
    cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
    n = siso.bits_per_frame(cfg, 14)
    fn = lane_chunked(lambda k, b, s, c: siso.simulate_siso(k, b, s, c), 4)
    # lane count == chunk, not a multiple, and single-frame: direct call
    for lanes in (4, 6):
        bits = jnp.asarray(np.random.default_rng(2).integers(
            0, 2, (lanes, n)).astype(np.int32))
        r = fn(jax.random.PRNGKey(0), bits,
               jnp.full((lanes,), 60.0, jnp.float32), cfg)
        assert r.bit_errors.shape == (lanes,)
        assert int(jnp.sum(r.bit_errors)) == 0
    bits1 = jnp.asarray(np.random.default_rng(3).integers(
        0, 2, n).astype(np.int32))
    r1 = fn(jax.random.PRNGKey(0), bits1, 60.0, cfg)
    assert r1.bit_errors.shape == ()

    with pytest.raises(ValueError):
        lane_chunked(fn, 4, mode="vmap")
