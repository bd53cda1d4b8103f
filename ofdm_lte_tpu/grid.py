"""LTE resource grid: static index tables and CRS pilot sequences.

All grid structure is data-independent, so everything here is precomputed with
NumPy at trace time and embedded as constants into the compiled XLA program —
no per-symbol Python classification loops like the reference's
LTEResourceGrid._init_subcarrier_types (/root/reference/core/resource_mapper.py:57-74).

Layout rules (identical to the reference):
- symmetric guards: left = (N-Nc)//2, right = N-Nc-left   (resource_mapper.py:45-46)
- DC null at k = N//2                                      (resource_mapper.py:49)
- pilots where (k - guard_left) % 6 == 3 inside the useful band, excluding DC
                                                           (resource_mapper.py:71)
- data = remaining useful bins

CRS pilot sequence: BPSK-phase-flipped QPSK pilot (1+1j)/√2 · ±1 with the ±1
drawn from the legacy NumPy MT19937 stream seeded by cell_id
(resource_mapper.py:148-151). We reproduce the exact sequence with a *local*
RandomState so the global RNG is never mutated (fixing the reference's
reproducibility hazard), and embed it as a constant.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

from .config import LTEConfig


class GridIndex(NamedTuple):
    """Static index tables for one numerology (NumPy arrays, trace-time)."""

    N: int
    Nc: int
    guard_left: int
    guard_right: int
    dc_index: int
    data_idx: np.ndarray     # (num_data,)  int32
    pilot_idx: np.ndarray    # (num_pilot,) int32
    guard_idx: np.ndarray    # (num_guard,) int32

    @property
    def num_data(self) -> int:
        return len(self.data_idx)

    @property
    def num_pilot(self) -> int:
        return len(self.pilot_idx)


@functools.lru_cache(maxsize=None)
def make_grid(N: int, Nc: int) -> GridIndex:
    guard_left = (N - Nc) // 2
    guard_right = N - Nc - guard_left
    dc = N // 2

    k = np.arange(N)
    in_band = (k >= guard_left) & (k < N - guard_right)
    is_dc = k == dc
    is_pilot = in_band & ~is_dc & ((k - guard_left) % 6 == 3)
    is_data = in_band & ~is_dc & ~is_pilot
    is_guard = ~in_band

    return GridIndex(
        N=N, Nc=Nc, guard_left=guard_left, guard_right=guard_right, dc_index=dc,
        data_idx=np.nonzero(is_data)[0].astype(np.int32),
        pilot_idx=np.nonzero(is_pilot)[0].astype(np.int32),
        guard_idx=np.nonzero(is_guard)[0].astype(np.int32),
    )


def grid_for(config: LTEConfig) -> GridIndex:
    return make_grid(config.N, config.Nc)


@functools.lru_cache(maxsize=None)
def pilot_sequence(cell_id: int, num_pilots: int) -> np.ndarray:
    """CRS pilot symbols, bit-exact with the reference's PN sequence.

    (1+1j)/√2 · choice([1,-1]) from MT19937(cell_id)
    (/root/reference/core/resource_mapper.py:147-152), without touching the
    global NumPy RNG.
    """
    rs = np.random.RandomState(cell_id)
    phases = rs.choice([1, -1], size=num_pilots)
    return ((1 + 1j) / np.sqrt(2) * phases).astype(np.complex128)


@functools.lru_cache(maxsize=None)
def interp_table(N: int, Nc: int) -> tuple:
    """Precomputed linear-interpolation table for CRS channel estimation.

    For every bin k in [0,N): indices (into the pilot array) of the left/right
    bracketing pilots and the interpolation weight w in [0,1], implementing the
    reference's per-segment np.linspace interpolation with constant edge
    extrapolation (/root/reference/core/lte_receiver.py:98-133):

        H[k] = (1-w)·Hp[left] + w·Hp[right]

    Returns (left, right, w) NumPy arrays of shape (N,).
    """
    g = make_grid(N, Nc)
    p = g.pilot_idx.astype(np.int64)
    k = np.arange(N)

    # position of each bin relative to pilot bins
    right = np.searchsorted(p, k, side="left")          # first pilot >= k
    left = right - 1
    left_c = np.clip(left, 0, len(p) - 1)
    right_c = np.clip(right, 0, len(p) - 1)

    denom = np.maximum(p[right_c] - p[left_c], 1)
    w = (k - p[left_c]) / denom
    # edges: before first pilot -> pilot 0 (w=0); at/after last pilot -> last
    w = np.where(right == 0, 0.0, w)
    w = np.where(left >= len(p) - 1, 0.0, w)
    w = np.clip(w, 0.0, 1.0)

    return (left_c.astype(np.int32), right_c.astype(np.int32), w.astype(np.float32))


@functools.lru_cache(maxsize=None)
def interp_table_custom(pilot_idx_tuple: tuple, N: int) -> tuple:
    """Interpolation table for an arbitrary (static) pilot index set.

    Used by the MIMO estimator whose per-TX orthogonal pilots are subsets of
    the CRS grid (/root/reference/core/mimo_channel_estimator_periodic.py:98-102).
    """
    p = np.asarray(pilot_idx_tuple, dtype=np.int64)
    k = np.arange(N)
    right = np.searchsorted(p, k, side="left")
    left = right - 1
    left_c = np.clip(left, 0, len(p) - 1)
    right_c = np.clip(right, 0, len(p) - 1)
    denom = np.maximum(p[right_c] - p[left_c], 1)
    w = (k - p[left_c]) / denom
    w = np.where(right == 0, 0.0, w)
    w = np.where(left >= len(p) - 1, 0.0, w)
    w = np.clip(w, 0.0, 1.0)
    return (left_c.astype(np.int32), right_c.astype(np.int32), w.astype(np.float32))


def pilot_step(num_tx: int, layout: str = "reference") -> int:
    """CRS FDM step for `num_tx` antennas.

    layout="reference": step = min(num_tx, 4)
    (/root/reference/core/mimo_channel_estimator_periodic.py:75-106) — for
    8 TX this makes TX t and TX t+4 SHARE pilot bins, so their estimates
    collide and 8-TX spatial multiplexing is degenerate (measured BER
    0.38-0.49 in results/spatial_grid_validation.json, both
    implementations). layout="extended": step = num_tx — every TX gets its
    own disjoint comb (documented divergence, PARITY.md; default stays
    reference-parity)."""
    if layout == "reference":
        return num_tx if num_tx <= 4 else 4
    if layout == "extended":
        return num_tx
    raise ValueError(f"unknown pilot layout {layout!r}")


def orthogonal_pilot_indices(config: LTEConfig, num_tx: int,
                             layout: str = "reference") -> list:
    """FDM-orthogonal CRS allocation for MIMO: every `step`-th pilot bin
    with per-TX offset (see pilot_step for the layout semantics), matching
    /root/reference/core/mimo_channel_estimator_periodic.py:88-106 in the
    default layout."""
    g = grid_for(config)
    step = pilot_step(num_tx, layout)
    return [g.pilot_idx[tx % step::step] for tx in range(num_tx)]
