"""CSI feedback: PMI / CQI / RI generation.

Replaces /root/reference/core/csi_feedback.py (perfect feedback: no delay,
no quantization error beyond the codebook itself):

- PMI: best codebook index by Σ|HW|² (csi_feedback.py:55-72)
- CQI: post-precoding SINR mapped through the 16-level TS 36.213-like table
  (csi_feedback.py:106-136)
- RI: 2 if λ2/λ1 > 0.2 else 1 (csi_feedback.py:138-160)
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .. import cplx
from ..cplx import C
from . import codebook as cb

# CQI table lower edges in dB (csi_feedback.py:113-130): CQI i is assigned
# when sinr_db >= edge[i] and < edge[i+1].
_CQI_EDGES_DB = np.array(
    [-6.0, -4.0, -2.0, 0.0, 2.0, 4.0, 6.0, 8.0, 10.0,
     12.0, 14.0, 16.0, 18.0, 20.0, 22.0], np.float32)


class Feedback(NamedTuple):
    pmi: jnp.ndarray
    cqi: jnp.ndarray
    ri: jnp.ndarray
    sinr_db: jnp.ndarray
    precoder: C           # (..., num_tx, 1)


def sinr_to_cqi(sinr_db: jnp.ndarray) -> jnp.ndarray:
    """Map SINR (dB) to CQI 0-15 by table lookup."""
    edges = jnp.asarray(_CQI_EDGES_DB)
    return jnp.sum(sinr_db[..., None] >= edges, axis=-1).astype(jnp.int32)


def rank_indicator(H: C) -> jnp.ndarray:
    """RI from the eigenvalue ratio of HᴴH (csi_feedback.py:138-160)."""
    Hh = C(H.re.swapaxes(-1, -2), -H.im.swapaxes(-1, -2))
    A = cplx.matmul_small(Hh, H)
    n = A.shape[-1]
    top = jnp.concatenate([A.re, -A.im], axis=-1)
    bot = jnp.concatenate([A.im, A.re], axis=-1)
    M = jnp.concatenate([top, bot], axis=-2)
    ev = jnp.linalg.eigvalsh(M)            # ascending, each eigenvalue doubled
    lam = ev[..., ::-1][..., ::2]          # descending complex eigenvalues
    if lam.shape[-1] < 2:
        return jnp.ones(lam.shape[:-1], jnp.int32)
    ratio = lam[..., 1] / (lam[..., 0] + 1e-12)
    return jnp.where(ratio > 0.2, 2, 1).astype(jnp.int32)


def generate_feedback(H: C, num_tx: int, noise_variance=1.0,
                      codebook_type: str = "TM6") -> Feedback:
    """Full CSI feedback {pmi, cqi, ri, sinr, W} (csi_feedback.py:162-190)."""
    pmi, power = cb.select_best_pmi(H, num_tx, codebook_type, rank=1,
                                    metric="capacity")
    sinr_db = 10.0 * jnp.log10(power / noise_variance)
    cqi = sinr_to_cqi(sinr_db)
    ri = rank_indicator(H)
    W = cb.precoder_for_pmi(pmi, num_tx, codebook_type, rank=1)
    return Feedback(pmi, cqi, ri, sinr_db, W)


def pmi_statistics(pmi_history, num_tx: int,
                   codebook_type: str = "TM6") -> dict:
    """Aggregate PMI-usage statistics over a feedback history
    (csi_feedback.py:192-206). In the reference the history is accumulated
    by a stateful object across calls; here it is any array of PMI values
    (e.g. the `pmi` field over Monte-Carlo lanes or feedback rounds).

    Returns {total_feedbacks, unique_pmis, most_common_pmi,
    pmi_distribution} — `most_common_pmi` breaks ties toward the lower
    index, matching `max(set(...), key=list.count)` on sorted uniques.
    """
    hist = np.asarray(pmi_history).ravel().astype(np.int64)
    size = cb.codebook_size(num_tx, codebook_type, rank=1)
    if hist.size == 0:
        return None
    dist = np.bincount(hist, minlength=size)
    return {
        "total_feedbacks": int(hist.size),
        "unique_pmis": int(np.count_nonzero(dist)),
        "most_common_pmi": int(np.argmax(dist)),
        "pmi_distribution": dist,
    }
