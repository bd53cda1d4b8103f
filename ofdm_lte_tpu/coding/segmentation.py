"""Code block segmentation (TS 36.212 §5.1.2) — host-side, shape-deciding.

Reproduces /root/reference/core/channel_coding/segmentation.py:74-263
including its filler-bit placement and per-block bit distribution (which
deviates slightly from the strict spec by distributing information bits
evenly with the remainder in the last block — behavior kept for parity).
Runs in NumPy because block sizes K± determine downstream static shapes.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .crc import attach_crc24b

Z_MAX = 6144

# Valid turbo interleaver sizes (TS 36.212 Table 5.1.3-3), identical to
# segmentation.py:34-50. Derived: 40..512 step 8, 528..1024 step 16,
# 1056..2048 step 32, 2112..6144 step 64.
TURBO_INTERLEAVER_SIZES = (
    list(range(40, 512 + 1, 8)) + list(range(528, 1024 + 1, 16))
    + list(range(1056, 2048 + 1, 32)) + list(range(2112, 6144 + 1, 64)))


def find_interleaver_size(min_size: int) -> int:
    for size in TURBO_INTERLEAVER_SIZES:
        if size >= min_size:
            return size
    raise ValueError(f"No valid interleaver size for min_size={min_size}")


def segment_code_blocks(tb_with_crc: np.ndarray) -> Tuple[List[np.ndarray], dict]:
    """Transport block (with CRC-24A) -> list of code blocks + metadata."""
    tb = np.asarray(tb_with_crc, np.uint8)
    B = len(tb)

    if B <= Z_MAX:
        K = find_interleaver_size(B)
        F = K - B
        cb = np.zeros(K, np.uint8)
        cb[F:] = tb
        meta = {
            "num_blocks": 1, "block_sizes": [K], "num_filler_bits": F,
            "filler_per_block": [F], "original_size": B, "segmented": False,
        }
        return [cb], meta

    L = 24
    C = int(np.ceil(B / (Z_MAX - L)))
    B_prime = B + C * L
    K_plus = find_interleaver_size(int(np.ceil(B_prime / C)))
    kp_idx = TURBO_INTERLEAVER_SIZES.index(K_plus)
    K_minus = TURBO_INTERLEAVER_SIZES[kp_idx - 1] if kp_idx > 0 else K_plus

    delta = K_plus - K_minus
    if delta > 0:
        C_minus = (C * K_plus - B_prime) // delta
        C_plus = C - C_minus
    else:
        C_minus, C_plus = 0, C

    # distribute info bits per block (segmentation.py:183-207): evenly with
    # the remainder in the last block
    bits_per_block = []
    remaining = B
    for r in range(C):
        K_r = K_minus if r < C_minus else K_plus
        avail = K_r - L
        if r == C - 1:
            take = remaining
        else:
            take = min(avail, remaining // (C - r))
        bits_per_block.append(take)
        remaining -= take

    blocks = []
    sizes = []
    fillers = []
    pos = 0
    for r in range(C):
        K_r = K_minus if r < C_minus else K_plus
        info = bits_per_block[r]
        body = np.zeros(K_r - L, np.uint8)
        F_r = (K_r - L) - info
        fillers.append(F_r)
        if info > 0:
            body[F_r:F_r + info] = tb[pos:pos + info]
        pos += info
        blocks.append(attach_crc24b(body))
        sizes.append(K_r)

    meta = {
        "num_blocks": C, "block_sizes": sizes,
        "num_filler_bits": int(sum(fillers)), "filler_per_block": fillers,
        "original_size": B, "segmented": True,
        "K_plus": K_plus, "K_minus": K_minus,
        "C_plus": C_plus, "C_minus": C_minus,
    }
    return blocks, meta


def segment_layout(B: int) -> dict:
    """Shape-only segmentation plan for a transport block of B bits
    (incl. CRC-24A) — everything `segment_code_blocks` decides that does
    not depend on the bit VALUES. Drives the fully in-graph batched coded
    chain (sim/coded.simulate_siso_coded_batched): block sizes and filler/
    info placement become static gather/scatter indices.

    Returns {segmented, sizes[C], fillers[C], info[C], positions[C]} where
    positions[r] is the start offset of block r's info bits within the TB.
    """
    if B <= Z_MAX:
        K = find_interleaver_size(B)
        return {"segmented": False, "sizes": [K], "fillers": [K - B],
                "info": [B], "positions": [0]}

    L = 24
    C = int(np.ceil(B / (Z_MAX - L)))
    B_prime = B + C * L
    K_plus = find_interleaver_size(int(np.ceil(B_prime / C)))
    kp_idx = TURBO_INTERLEAVER_SIZES.index(K_plus)
    K_minus = TURBO_INTERLEAVER_SIZES[kp_idx - 1] if kp_idx > 0 else K_plus
    delta = K_plus - K_minus
    C_minus = (C * K_plus - B_prime) // delta if delta > 0 else 0

    sizes, fillers, info, positions = [], [], [], []
    remaining, pos = B, 0
    for r in range(C):
        K_r = K_minus if r < C_minus else K_plus
        avail = K_r - L
        take = remaining if r == C - 1 else min(avail, remaining // (C - r))
        sizes.append(K_r)
        fillers.append(avail - take)
        info.append(take)
        positions.append(pos)
        remaining -= take
        pos += take
    return {"segmented": True, "sizes": sizes, "fillers": fillers,
            "info": info, "positions": positions}


def desegment_code_blocks(blocks: List[np.ndarray], meta: dict) -> np.ndarray:
    """Inverse (segmentation.py:266-360): strip per-block CRC-24B (if
    segmented) and filler bits, concatenate."""
    if not meta["segmented"]:
        F = meta["filler_per_block"][0]
        return np.asarray(blocks[0], np.uint8)[F:]

    out = []
    for blk, F_r in zip(blocks, meta["filler_per_block"]):
        body = np.asarray(blk, np.uint8)[:-24]   # drop CRC-24B
        out.append(body[F_r:])                   # drop filler
    return np.concatenate(out)[:meta["original_size"]]
