"""Lane-chunked execution: run a batched sim over lane chunks SEQUENTIALLY
inside one XLA program.

Why: several pipelines have measured lane-scaling CLIFFS — per-lane
throughput collapses past a knee (SFBC 95.2k frames/s at 512 lanes ->
50.9k at 1024; the coded block-BCJR 1741 TB/s at 128 -> 908 at 256;
results/diversity_lane_scaling.json, results/coded_batch_scaling.json).
The big-batch program crosses a compiler scheduling/layout threshold on
one op, and every op in the program then pays. Running the same total
lanes as knee-sized chunks chained through a lax.map keeps every chunk's
program in its fast regime at the cost of one extra sequential dispatch
per chunk (~the scan overhead, NOT the 1.4 ms host dispatch floor — the
chunks live inside one program).

`lane_chunked(sim_fn, chunk)` wraps any sim whose first three arguments
are (key, bits, snr) with leading lane axes on bits/snr; extra
args/kwargs pass through as trace-time constants. Outputs (pytrees with
the lane axis leading) are re-concatenated, and each chunk gets an
independent fold of the key — results are NOT bit-identical to the
unchunked call (different key split structure), but are draws from the
identical distribution (the unchunked call's lanes are independent too).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lane_chunked(sim_fn, chunk_size: int):
    """Wrap sim_fn(key, bits, snr, *args, **kw) to process leading-axis
    lanes in `chunk_size` chunks via lax.map (sequential, one program).

    Falls back to a direct call when the lane count is not a positive
    multiple of chunk_size, when it equals chunk_size, or when bits has
    no lane axis (single-frame call).
    """
    def wrapped(key, bits, snr, *args, **kw):
        if bits.ndim < 2:
            return sim_fn(key, bits, snr, *args, **kw)
        L = bits.shape[0]
        if L <= chunk_size or L % chunk_size:
            return sim_fn(key, bits, snr, *args, **kw)
        n = L // chunk_size
        bits_c = bits.reshape((n, chunk_size) + bits.shape[1:])
        snr_arr = jnp.asarray(snr, jnp.float32)
        if snr_arr.ndim and snr_arr.shape[0] == L:
            snr_c = snr_arr.reshape((n, chunk_size) + snr_arr.shape[1:])
        else:
            snr_c = jnp.broadcast_to(snr_arr, (n,) + snr_arr.shape)
        keys = jax.random.split(key, n)

        out = jax.lax.map(
            lambda xs: sim_fn(xs[0], xs[1], xs[2], *args, **kw),
            (keys, bits_c, snr_c))
        return jax.tree.map(
            lambda x: x.reshape((L,) + x.shape[2:])
            if (hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[:2] == (n, chunk_size)) else x, out)

    return wrapped
