"""Per-TX CRS channel estimation for MIMO with FDM-orthogonal pilots.

Implements the *intended* behavior of
/root/reference/core/mimo_channel_estimator_periodic.py (whose
estimate_channel_periodic path crashes as written — it unpacks 3 values from
a 2-tuple at line 219; SURVEY §2.4 directs the build to realize the intended
per-TX slot-periodic estimates):

- TX t transmits CRS on every step-th pilot bin with offset t (step =
  min(num_tx, 4)), using the cell_id = t%4 pilot sequence
  (mimo_channel_estimator_periodic.py:88-106).
- Per (rx, tx): LS at that TX's pilot bins, linear interpolation to all/
  selected bins (reusing LTEChannelEstimator._interpolate_channel semantics,
  lines 160-171), estimated once per 14-symbol slot and reused inside the
  slot.
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from .. import cplx
from ..cplx import C
from ..config import LTEConfig
from ..grid import grid_for, pilot_sequence, orthogonal_pilot_indices
from . import estimation as est


def estimate_per_tx_planes(pilot_bins_rx: C, config: LTEConfig, num_tx: int,
                           out_bins: np.ndarray) -> List[C]:
    """Per-TX estimates as a LIST of planes (no trailing tx axis).

    pilot_bins_rx: C (..., n_pilot_all) — received values at ALL CRS pilot
    bins (the union over TX) for one RX. Returns [num_tx] C planes of
    shape (..., len(out_bins)). The plane form feeds the spatial
    pipeline's plane-based detector (mimo.detector.mmse2_planes) without
    materializing a (..., tx, n_out) stacked array."""
    g = grid_for(config)
    step = num_tx if num_tx <= 4 else 4
    per_tx = []
    for tx in range(num_tx):
        idx = g.pilot_idx[tx % step::step]
        rx_p = pilot_bins_rx[..., tx % step::step]
        known = cplx.const(pilot_sequence(tx % 4, len(idx)))
        h_p = rx_p * known.conj()          # unit-modulus pilots: Y/X = Y·X*
        h = est.interpolate(h_p, config, out_bins=out_bins, pilot_idx=idx)
        per_tx.append(h)
    return per_tx


def estimate_per_tx(pilot_bins_rx: C, config: LTEConfig, num_tx: int,
                    out_bins: np.ndarray) -> C:
    """Estimate H for each TX from the full received pilot-bin vector.

    pilot_bins_rx: C (..., n_pilot_all) — received values at ALL CRS pilot
    bins (the union over TX). Returns C (..., num_tx, len(out_bins)).
    """
    return cplx.stack(
        estimate_per_tx_planes(pilot_bins_rx, config, num_tx, out_bins),
        axis=-2)                           # (..., num_tx, n_out)
