"""Rate matching for turbo codes (TS 36.212 §5.1.4) as precomputed gathers.

The reference builds the sub-block interleaver matrices, NULL bookkeeping and
circular buffer with Python loops and sets on every call
(/root/reference/core/channel_coding/rate_matching.py). All of that is
data-independent: for static (K, E, rv) the entire forward rate matching is
ONE gather `out = src[fwd_idx]` and the LLR de-matching is one scatter-add
plus one gather. Index tables are built once in NumPy and cached.

Reference-specific conventions preserved for parity:
- 32-column sub-block interleaver with the fixed permutation P
  (rate_matching.py:65-68), column-major fill, NULLs at the tail of the
  column-major order, row-major readout with NULLs removed;
- streams d0 = sys+tail1+tail2 (K+6), d1/d2 = parity+tail (K+3), zero-padded
  to a common length before interlacing the circular buffer as
  [v0_i, v1_i, v2_i] (rate_matching.py:264-278 — this interlacing deviates
  from the strict 36.212 layout, which keeps v0 contiguous; kept as-is);
- RV start offsets {0, ¼, ½, ¾}·N_cb (rate_matching.py:285-290);
- de-matching sums repeated LLRs (soft combining) and leaves punctured
  positions at LLR 0 (rate_matching.py:422-436).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp

SUBBLOCK_PERM = np.array([
    0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30,
    1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31], np.int64)


@functools.lru_cache(maxsize=None)
def subblock_perm_indices(K_pi: int) -> np.ndarray:
    """perm such that v[j] = d[perm[j]] for a K_pi-length stream."""
    D = 32
    R = int(np.ceil(K_pi / D))
    out = []
    for row in range(R):
        for c in range(D):
            src = SUBBLOCK_PERM[c] * R + row   # column-major source index
            if src < K_pi:
                out.append(src)
    return np.asarray(out, np.int64)


@functools.lru_cache(maxsize=None)
def _stream_maps(K: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Map each d-stream position to its index in the encoder's interlaced
    output (3K+12), following turbo_encode's layout."""
    d0 = np.concatenate([3 * np.arange(K),                    # systematic
                         3 * K + np.arange(3),                # sys tail 1
                         3 * K + 6 + np.arange(3)])           # sys tail 2
    d1 = np.concatenate([3 * np.arange(K) + 1,
                         3 * K + 3 + np.arange(3)])
    d2 = np.concatenate([3 * np.arange(K) + 2,
                         3 * K + 9 + np.arange(3)])
    return d0, d1, d2


@functools.lru_cache(maxsize=None)
def _cb_source(K: int) -> np.ndarray:
    """For each circular-buffer position: source index into the encoder
    output (3K+12), or -1 for a zero pad."""
    d0m, d1m, d2m = _stream_maps(K)
    v0 = d0m[subblock_perm_indices(K + 6)]
    v1 = d1m[subblock_perm_indices(K + 3)]
    v2 = d2m[subblock_perm_indices(K + 3)]
    max_len = K + 6
    cb = np.full(3 * max_len, -1, np.int64)
    cb[0:3 * max_len:3][:len(v0)] = v0
    cb[1:3 * max_len:3][:len(v1)] = v1
    cb[2:3 * max_len:3][:len(v2)] = v2
    return cb


@functools.lru_cache(maxsize=None)
def forward_indices(K: int, E: int, rv_idx: int = 0) -> np.ndarray:
    """Gather index: rate_matched[i] = padded_encoded[fwd[i]], where
    padded_encoded has the 3K+12 encoder bits followed by one zero at index
    3K+12 (for the -1 pads)."""
    cb = _cb_source(K)
    N_cb = len(cb)
    start = [0, N_cb // 4, N_cb // 2, 3 * N_cb // 4][rv_idx % 4]
    pos = (start + np.arange(E)) % N_cb
    src = cb[pos]
    return np.where(src < 0, 3 * K + 12, src).astype(np.int32)


@functools.lru_cache(maxsize=None)
def dematch_tables(K: int, E: int, rv_idx: int = 0):
    """(cb_positions (E,), enc_from_cb (3K+12,)) for LLR de-matching."""
    cb = _cb_source(K)
    N_cb = len(cb)
    start = [0, N_cb // 4, N_cb // 2, 3 * N_cb // 4][rv_idx % 4]
    pos = ((start + np.arange(E)) % N_cb).astype(np.int32)
    enc_from_cb = np.full(3 * K + 12, N_cb, np.int32)  # default: zero slot
    for p, s in enumerate(cb):
        if s >= 0:
            enc_from_cb[s] = p
    return pos, enc_from_cb


def rate_match(encoded: jnp.ndarray, E: int, K: int,
               rv_idx: int = 0) -> jnp.ndarray:
    """encoded (..., 3K+12) -> (..., E). One gather."""
    fwd = jnp.asarray(forward_indices(K, E, rv_idx))
    padded = jnp.concatenate(
        [encoded, jnp.zeros(encoded.shape[:-1] + (1,), encoded.dtype)],
        axis=-1)
    return jnp.take(padded, fwd, axis=-1)


def rate_dematch(llrs: jnp.ndarray, K: int, rv_idx: int = 0) -> jnp.ndarray:
    """llrs (..., E) -> encoder-order LLRs (..., 3K+12).

    Repetitions soft-combine (sum); punctured positions stay 0.
    """
    E = llrs.shape[-1]
    pos, enc_from_cb = dematch_tables(K, E, rv_idx)
    N_cb = 3 * (K + 6)
    cb = jnp.zeros(llrs.shape[:-1] + (N_cb + 1,), llrs.dtype)
    cb = cb.at[..., jnp.asarray(pos)].add(llrs)
    return jnp.take(cb, jnp.asarray(enc_from_cb), axis=-1)
