"""Native C library (bit packing / CRC) vs NumPy ground truth."""
import numpy as np
import pytest

from ofdm_lte_tpu import native_ext
from ofdm_lte_tpu.coding import crc


def test_native_builds():
    assert native_ext.available(), "native library failed to build"


def test_pack_unpack_roundtrip(rng):
    bits = rng.integers(0, 2, 1003).astype(np.uint8)
    packed = native_ext.pack_bits(bits)
    np.testing.assert_array_equal(packed, np.packbits(bits))
    back = native_ext.unpack_bits(packed, 1003)
    np.testing.assert_array_equal(back, bits)


@pytest.mark.parametrize("n", [8, 100, 1001, 50000])
def test_native_crc_matches_python(n, rng):
    bits = rng.integers(0, 2, n).astype(np.uint8)
    for poly, nbits in [(crc.CRC24A_POLY, 24), (crc.CRC24B_POLY, 24),
                        (crc.CRC16_POLY, 16)]:
        reg = native_ext.crc_register(bits, poly, nbits)
        ref_bits = crc._crc_bits_numpy(bits, poly, nbits)
        ref_reg = int("".join(map(str, ref_bits)), 2)
        assert reg == ref_reg


def test_bit_errors(rng):
    a = rng.integers(0, 2, 5000).astype(np.uint8)
    b = a.copy()
    idx = rng.choice(5000, 37, replace=False)
    b[idx] ^= 1
    assert native_ext.bit_errors(a, b) == 37


def test_crc_uses_native_consistently(rng):
    """crc.calculate_* (which may route through native) equals the pure
    NumPy path."""
    bits = rng.integers(0, 2, 3000).astype(np.uint8)
    np.testing.assert_array_equal(
        crc.calculate_crc24a(bits),
        crc._crc_bits_numpy(bits, crc.CRC24A_POLY, 24))
