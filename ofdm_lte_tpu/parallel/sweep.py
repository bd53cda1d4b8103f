"""Monte-Carlo BER/PAPR sweeps sharded over a TPU device mesh.

The reference's entire "distributed" story is a sequential Python loop over
SNR points × trials (/root/reference/core/ofdm_core.py:1795-1846) plus a
thread pool per RX antenna (core/parallel_processing.py). TPU-native
replacement per SURVEY §2.9:

- SNR points and Monte-Carlo frames are ARRAY AXES of one jitted program;
- frames shard across chips via shard_map over a 1-D 'mc' mesh;
- bit-error counters reduce with jax.lax.psum over ICI;
- randomness is key-split per (device, snr, frame) — no global RNG.

Multi-host: build the mesh from jax.devices() after jax.distributed
initialization — the same shard_map program then spans hosts, with psum
riding ICI within a slice and DCN across hosts. DP is the only parallelism
dimension this workload needs (no TP/PP/EP — there are no weights); the mesh
is 1-D by design, not by limitation.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..config import LTEConfig
from ..sim import siso


def _bits_per_frame(config, num_ofdm_symbols, mode, pipeline):
    if pipeline in ("siso", "simo"):
        return siso.bits_per_frame(config, num_ofdm_symbols, mode)
    if pipeline == "sfbc":
        from ..sim import diversity
        return diversity.sfbc_bits_per_frame(config, num_ofdm_symbols)
    if pipeline == "spatial":
        from ..sim import spatial
        return spatial.bits_per_frame(config, num_ofdm_symbols)
    raise ValueError(f"unknown pipeline {pipeline}")


def _run_pipeline(k, b, snr, config, mode, channel_type, itu_profile,
                  velocity_kmh, pipeline, num_tx, num_rx):
    """Returns (bit_errors, papr_db) for one Monte-Carlo lane."""
    if pipeline == "siso":
        r = siso.simulate_siso(k, b, snr, config, mode=mode,
                               channel_type=channel_type,
                               itu_profile=itu_profile,
                               velocity_kmh=velocity_kmh)
        return r.bit_errors, r.papr_db
    if pipeline == "simo":
        from ..sim import diversity
        r = diversity.simulate_simo(k, b, snr, config, num_rx=num_rx,
                                    channel_type=channel_type,
                                    itu_profile=itu_profile,
                                    velocity_kmh=velocity_kmh)
        return r.bit_errors, r.papr_db
    if pipeline == "sfbc":
        from ..sim import diversity
        r = diversity.simulate_sfbc(k, b, snr, config, num_rx=num_rx,
                                    channel_type=channel_type,
                                    itu_profile=itu_profile,
                                    velocity_kmh=velocity_kmh)
        return r.bit_errors, r.papr_db
    if pipeline == "spatial":
        from ..sim import spatial
        r = spatial.simulate_spatial_multiplexing(
            k, b, snr, config, num_tx=num_tx, num_rx=num_rx,
            rank=min(num_tx, num_rx), detector_type="MMSE",
            channel_type=channel_type, itu_profile=itu_profile,
            velocity_kmh=velocity_kmh or 3.0)
        return r.bit_errors, jnp.zeros_like(r.ber)
    raise ValueError(f"unknown pipeline {pipeline}")


class SweepResult(NamedTuple):
    snr_db: jnp.ndarray        # (S,)
    ber: jnp.ndarray           # (S,)
    bit_errors: jnp.ndarray    # (S,) summed over all frames/devices
    total_bits: jnp.ndarray    # (S,)
    papr_db: jnp.ndarray       # (S,) mean over frames
    frames: int


def make_mesh(devices=None, axis_name: str = "mc") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def ber_sweep(key: jax.Array, config: LTEConfig, snr_points,
              frames_per_device: int = 8, num_ofdm_symbols: int = 28,
              mesh: Mesh = None, mode: str = "lte",
              channel_type: str = "awgn", itu_profile: str = "Pedestrian_A",
              velocity_kmh: float = None, pipeline: str = "siso",
              num_tx: int = 2, num_rx: int = 2) -> SweepResult:
    """Run a full BER sweep: (num_devices · frames_per_device) frames per SNR
    point, error counts psum-reduced across the mesh.

    pipeline: "siso" (default), "simo", "sfbc" or "spatial" — the full
    TX→channel→RX chain of the corresponding sim module runs inside the
    sharded program. Replaces OFDMSimulator.run_ber_sweep
    (ofdm_core.py:1795-1846) and the legacy OFDMSystem sweeps
    (ofdm_system.py:432-602).
    """
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    snr_points = jnp.asarray(snr_points, jnp.float32)
    S = snr_points.shape[0]
    n_bits = _bits_per_frame(config, num_ofdm_symbols, mode, pipeline)
    F = frames_per_device

    def per_device(key, snrs):
        # distinct stream per device, derived from a REPLICATED base key —
        # multi-process safe (no host-side key sharding needed; decorrelation
        # comes from the device's global mesh index)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        kb, kc = jax.random.split(key)
        bits = jax.random.bernoulli(kb, 0.5, (S, F, n_bits)).astype(jnp.int32)
        keys = jax.random.split(kc, S * F).reshape(S, F, 2)

        def one_lane(k, b, snr):
            r = _run_pipeline(k, b, snr, config, mode, channel_type,
                              itu_profile, velocity_kmh, pipeline,
                              num_tx, num_rx)
            return r

        errs, paprs = jax.vmap(
            lambda ks, bs, snr: jax.vmap(
                lambda k, b: one_lane(k, b, snr))(ks, bs)
        )(keys, bits, snrs)

        errors = jax.lax.psum(jnp.sum(errs, axis=1), axis)          # (S,)
        papr = jax.lax.pmean(jnp.mean(paprs, axis=1), axis)         # (S,)
        return errors, papr

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
    )
    errors, papr = jax.jit(sharded)(key, snr_points)

    total = jnp.full((S,), n_bits * F * len(mesh.devices.flat), jnp.int64
                     if jax.config.jax_enable_x64 else jnp.int32)
    return SweepResult(snr_points, errors / total, errors, total, papr,
                       int(F * len(mesh.devices.flat)))
