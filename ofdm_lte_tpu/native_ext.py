"""ctypes loader for the native host data-path library (native/bitops.cc).

Builds the shared library on demand (g++ is in the image; pybind11 is not,
so the C ABI + ctypes is the binding layer). Every entry point has a NumPy
fallback so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbitops.so")


@functools.lru_cache(maxsize=1)
def _lib():
    """Load (building if needed) the native library; None on failure."""
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.olt_pack_bits.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.olt_unpack_bits.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.olt_crc_bits.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint32,
                                     ctypes.c_int]
        lib.olt_crc_bits.restype = ctypes.c_uint32
        lib.olt_bit_errors.argtypes = [u8p, u8p, ctypes.c_int64]
        lib.olt_bit_errors.restype = ctypes.c_int64
        return lib
    except Exception:
        return None


def available() -> bool:
    return _lib() is not None


def _u8p(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def pack_bits(bits: np.ndarray) -> np.ndarray:
    bits = np.ascontiguousarray(bits, np.uint8)
    lib = _lib()
    if lib is None:
        return np.packbits(bits)
    out = np.empty((len(bits) + 7) // 8, np.uint8)
    lib.olt_pack_bits(_u8p(bits), len(bits), _u8p(out))
    return out


def unpack_bits(data: np.ndarray, n_bits: int = None) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    n = n_bits if n_bits is not None else len(data) * 8
    lib = _lib()
    if lib is None:
        return np.unpackbits(data)[:n]
    out = np.empty(n, np.uint8)
    lib.olt_unpack_bits(_u8p(data), n, _u8p(out))
    return out


def crc_register(bits: np.ndarray, poly: int, nbits: int) -> int:
    """CRC register value over an MSB-first bit array."""
    bits = np.ascontiguousarray(bits, np.uint8)
    lib = _lib()
    if lib is None:
        from .coding.crc import _crc_bits_numpy
        out = _crc_bits_numpy(bits, poly, nbits)
        return int("".join(map(str, out)), 2) if len(out) else 0
    return int(lib.olt_crc_bits(_u8p(bits), len(bits), poly, nbits))


def bit_errors(a: np.ndarray, b: np.ndarray) -> int:
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    n = min(len(a), len(b))
    lib = _lib()
    if lib is None:
        return int(np.sum(a[:n] != b[:n]))
    return int(lib.olt_bit_errors(_u8p(a), _u8p(b), n))
