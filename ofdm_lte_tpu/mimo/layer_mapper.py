"""TS 36.211 §6.3.3 layer mapping as pure reshapes.

Round-robin symbols -> rank layers (reference: LayerMapper at
/root/reference/core/layer_mapper.py:35-115): symbols s0,s1,s2,... map to
layers[l][i] = s[i·L + l], i.e. reshape(n/L, L).T — no loops, no classes.
"""
from __future__ import annotations

import numpy as np

from ..cplx import C


def padded_length(n: int, num_layers: int) -> int:
    """Length after zero-padding to a multiple of num_layers
    (layer_mapper.py:133-150)."""
    if num_layers == 1:
        return n
    r = n % num_layers
    return n if r == 0 else n + num_layers - r


def map_to_layers(symbols: C, num_layers: int) -> C:
    """(..., n) -> (..., num_layers, n/num_layers). n must already be padded
    to a multiple of num_layers (use padded_length)."""
    n = symbols.shape[-1]
    lead = symbols.shape[:-1]
    x = symbols.reshape(lead + (n // num_layers, num_layers))
    perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead))
    return x.transpose(*perm)


def demap_from_layers(layers: C, original_length: int = None) -> C:
    """Inverse: (..., L, m) -> (..., L·m), truncated to original_length."""
    lead = layers.shape[:-2]
    L, m = layers.shape[-2], layers.shape[-1]
    perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead))
    out = layers.transpose(*perm).reshape(lead + (L * m,))
    if original_length is not None:
        out = out[..., :original_length]
    return out
