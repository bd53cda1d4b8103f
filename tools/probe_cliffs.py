"""Root-cause probe for the lane-scaling cliffs (VERDICT r4 task 1).

Two documented collapses (results/diversity_lane_scaling.json,
results/coded_batch_scaling.json):
- SFBC 2x1 10 MHz 16-QAM: 95.2k frames/s at 512 lanes -> 50.9k at 1024
- coded QPSK 5 MHz (block-BCJR): 1741 TB/s at 128 lanes -> 908 at 256

Hypothesis: the big-batch program crosses a compiler scheduling/layout
threshold on ONE op; processing the same total lanes as CHAINED
half-batches inside one program (lax.scan over chunks) should restore
the per-lane rate of the knee-sized batch minus one extra dispatch.

Run on the real TPU: python tools/probe_cliffs.py [sfbc|coded|stages]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _time_steps, _key, _rolls_record  # noqa: E402

_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "cliff_probe.json")
try:            # accumulate across invocations of different probe modes
    with open(_PATH) as _f:
        OUT = json.load(_f)
except (OSError, ValueError):
    OUT = {}


def _rec(name, val):
    OUT[name] = val
    with open(_PATH, "w") as f:
        json.dump(OUT, f, indent=2)
    print(f"## {name}: {val if not isinstance(val, dict) else {k: v for k, v in val.items() if k != 'rolls'}}",
          flush=True)


def _sfbc_step(cfg, bits, snr):
    from ofdm_lte_tpu.sim import diversity

    def step(key):
        r = diversity.simulate_sfbc(key, bits, snr, cfg, num_rx=1,
                                    channel_type="rayleigh_mp",
                                    itu_profile="Pedestrian_A",
                                    velocity_kmh=3.0)
        return r.bit_errors
    return step


def probe_sfbc():
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import diversity

    cfg = LTEConfig(bandwidth=10.0, modulation="16-QAM")
    rng = np.random.default_rng(0)
    n = diversity.sfbc_bits_per_frame(cfg, 14)

    for lanes in (512, 1024):
        bits = jnp.asarray(rng.integers(0, 2, (lanes, n)).astype(np.int8))
        snr = jnp.full((lanes,), 15.0, jnp.float32)
        dt = _time_steps(_sfbc_step(cfg, bits, snr), _key(0), n_steps=8,
                         n_rolls=2, slow_step_s=lanes / 45000.0,
                         max_extra_rolls=1)
        _rec(f"sfbc_flat_{lanes}", {
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_s": round(lanes / dt, 1),
            "rolls": _rolls_record()})

    # 1024 lanes as TWO chained 512-lane chunks inside one program
    bits2 = jnp.asarray(rng.integers(0, 2, (2, 512, n)).astype(np.int8))
    snr2 = jnp.full((512,), 15.0, jnp.float32)

    def step_chunked(key):
        from ofdm_lte_tpu.sim import diversity as div

        def body(carry, xs):
            k, b = xs
            r = div.simulate_sfbc(k, b, snr2, cfg, num_rx=1,
                                  channel_type="rayleigh_mp",
                                  itu_profile="Pedestrian_A",
                                  velocity_kmh=3.0)
            return carry + jnp.sum(r.bit_errors), 0

        keys = jax.random.split(key, 2)
        tot, _ = jax.lax.scan(body, jnp.int32(0), (keys, bits2))
        return tot

    dt = _time_steps(step_chunked, _key(0), n_steps=8, n_rolls=2,
                     slow_step_s=1024 / 45000.0, max_extra_rolls=1)
    _rec("sfbc_chunked_2x512", {
        "ms_per_step": round(dt * 1e3, 2),
        "frames_per_s": round(1024 / dt, 1),
        "rolls": _rolls_record()})


def probe_sfbc_variants():
    """Follow-ups after the first probe run (2026-08-21) measured
    chunked-scan 2x512 = 60.3k frames/s — above the 1024-flat 49.8k but
    well short of 2x the 512 rate (91.5k). Candidates for the residual:
    (a) lax.scan sequencing overhead/fusion barriers -> try an UNROLLED
    two-chunk program (plain Python loop inside one jit, XLA free to
    schedule both halves); (b) the knee itself sits below 512 ->
    scan-chunk at 256."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import diversity

    cfg = LTEConfig(bandwidth=10.0, modulation="16-QAM")
    rng = np.random.default_rng(0)
    n = diversity.sfbc_bits_per_frame(cfg, 14)

    bits2 = jnp.asarray(rng.integers(0, 2, (2, 512, n)).astype(np.int8))
    snr2 = jnp.full((512,), 15.0, jnp.float32)

    def step_unrolled(key):
        keys = jax.random.split(key, 2)
        tot = jnp.int32(0)
        for i in range(2):
            r = diversity.simulate_sfbc(keys[i], bits2[i], snr2, cfg,
                                        num_rx=1,
                                        channel_type="rayleigh_mp",
                                        itu_profile="Pedestrian_A",
                                        velocity_kmh=3.0)
            tot = tot + jnp.sum(r.bit_errors)
        return tot

    dt = _time_steps(step_unrolled, _key(0), n_steps=8, n_rolls=2,
                     slow_step_s=1024 / 45000.0, max_extra_rolls=1)
    _rec("sfbc_unrolled_2x512", {
        "ms_per_step": round(dt * 1e3, 2),
        "frames_per_s": round(1024 / dt, 1),
        "rolls": _rolls_record()})

    # scan-chunk at 256: if per-chunk cost is still superlinear at 512,
    # smaller chunks should win despite more scan iterations
    bits4 = jnp.asarray(rng.integers(0, 2, (4, 256, n)).astype(np.int8))
    snr4 = jnp.full((256,), 15.0, jnp.float32)

    def step_chunk256(key):
        def body(carry, xs):
            k, b = xs
            r = diversity.simulate_sfbc(k, b, snr4, cfg, num_rx=1,
                                        channel_type="rayleigh_mp",
                                        itu_profile="Pedestrian_A",
                                        velocity_kmh=3.0)
            return carry + jnp.sum(r.bit_errors), 0

        keys = jax.random.split(key, 4)
        tot, _ = jax.lax.scan(body, jnp.int32(0), (keys, bits4))
        return tot

    dt = _time_steps(step_chunk256, _key(0), n_steps=8, n_rolls=2,
                     slow_step_s=1024 / 45000.0, max_extra_rolls=1)
    _rec("sfbc_chunked_4x256", {
        "ms_per_step": round(dt * 1e3, 2),
        "frames_per_s": round(1024 / dt, 1),
        "rolls": _rolls_record()})


def probe_unroll2():
    """Round-2 follow-ups after unrolled 2x512 SFBC measured 124.8k
    frames/s (1.36x the per-lane KNEE rate): (a) does unrolling help the
    COD ED chain too (two independent block-BCJRs interleaving their
    latency-bound stages)? (b) finer unrolls: SFBC 4x256 at 1024 lanes
    and 2x256 at 512 — if interleaving beats the knee's own latency
    profile, the 512-lane operating point itself should improve."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.parallel.chunking import lane_chunked
    from ofdm_lte_tpu.sim import coded, diversity

    # coded: 256 lanes as 2x128 UNROLLED
    ccfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    cbits = jnp.asarray(rng.integers(0, 2, (256, 6000)).astype(np.int32))
    csnr = jnp.full((256,), 5.0, jnp.float32)
    csim = lane_chunked(coded.simulate_siso_coded_batched, 128,
                        mode="unroll")

    def cstep(key):
        r = csim(key, cbits, csnr, ccfg)
        return jnp.sum(r.bit_errors), jnp.sum(r.crc_pass)

    dt = _time_steps(cstep, _key(0), n_steps=4, n_rolls=2,
                     slow_step_s=256 / 700.0, max_extra_rolls=1)
    _rec("coded_unrolled_2x128", {
        "ms_per_step": round(dt * 1e3, 2),
        "tb_per_s": round(256 / dt, 1),
        "rolls": _rolls_record()})

    # sfbc finer unrolls through the shipped utility
    cfg = LTEConfig(bandwidth=10.0, modulation="16-QAM")
    n = diversity.sfbc_bits_per_frame(cfg, 14)

    def sfbc_sim(key, bits, snr, cfg):
        return diversity.simulate_sfbc(key, bits, snr, cfg, num_rx=1,
                                       channel_type="rayleigh_mp",
                                       itu_profile="Pedestrian_A",
                                       velocity_kmh=3.0)

    for total, chunk in ((1024, 256), (512, 256)):
        bits = jnp.asarray(rng.integers(0, 2, (total, n)).astype(np.int8))
        snr = jnp.full((total,), 15.0, jnp.float32)
        sim = lane_chunked(sfbc_sim, chunk, mode="unroll")

        def step(key, bits=bits, snr=snr, sim=sim):
            return jnp.sum(sim(key, bits, snr, cfg).bit_errors)

        dt = _time_steps(step, _key(0), n_steps=8, n_rolls=2,
                         slow_step_s=total / 45000.0, max_extra_rolls=1)
        _rec(f"sfbc_unrolled_{total // chunk}x{chunk}", {
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_s": round(total / dt, 1),
            "rolls": _rolls_record()})


def probe_unroll3():
    """Round-3 follow-ups: (a) finer SFBC unrolls (8x128 at 1024,
    4x128 at 512) — 4x256 beat 2x512 at 1024 lanes (141.4k vs 124.8k),
    so test whether 128-chunks win more; (b) does the unroll trick
    transfer to SIMO 1x4 (knee 73.5k at 512, flat-ish 73.7k at 1024)
    and spatial 2x2 (the other volume pipelines)?"""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.parallel.chunking import lane_chunked
    from ofdm_lte_tpu.sim import diversity, siso, spatial

    rng = np.random.default_rng(0)

    cfg = LTEConfig(bandwidth=10.0, modulation="16-QAM")
    n = diversity.sfbc_bits_per_frame(cfg, 14)

    def sfbc_sim(key, bits, snr, cfg):
        return diversity.simulate_sfbc(key, bits, snr, cfg, num_rx=1,
                                       channel_type="rayleigh_mp",
                                       itu_profile="Pedestrian_A",
                                       velocity_kmh=3.0)

    for total, chunk in ((1024, 128), (512, 128)):
        bits = jnp.asarray(rng.integers(0, 2, (total, n)).astype(np.int8))
        snr = jnp.full((total,), 15.0, jnp.float32)
        sim = lane_chunked(sfbc_sim, chunk, mode="unroll")

        def step(key, bits=bits, snr=snr, sim=sim):
            return jnp.sum(sim(key, bits, snr, cfg).bit_errors)

        dt = _time_steps(step, _key(0), n_steps=8, n_rolls=2,
                         slow_step_s=total / 60000.0, max_extra_rolls=1)
        _rec(f"sfbc_unrolled_{total // chunk}x{chunk}", {
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_s": round(total / dt, 1),
            "rolls": _rolls_record()})

    # SIMO 1x4 QPSK 5 MHz (the bench shape) unrolled at 512 and 1024
    scfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    ns = siso.bits_per_frame(scfg, 14)

    def simo_sim(key, bits, snr, cfg):
        return diversity.simulate_simo(key, bits, snr, cfg, num_rx=4,
                                       channel_type="rayleigh_mp",
                                       itu_profile="Pedestrian_A",
                                       velocity_kmh=3.0)

    for total, chunk in ((512, 256), (1024, 256)):
        bits = jnp.asarray(rng.integers(0, 2, (total, ns)).astype(np.int8))
        snr = jnp.full((total,), 10.0, jnp.float32)
        sim = lane_chunked(simo_sim, chunk, mode="unroll")

        def step(key, bits=bits, snr=snr, sim=sim):
            return jnp.sum(sim(key, bits, snr, scfg).bit_errors)

        dt = _time_steps(step, _key(0), n_steps=8, n_rolls=2,
                         slow_step_s=total / 50000.0, max_extra_rolls=1)
        _rec(f"simo_unrolled_{total // chunk}x{chunk}", {
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_s": round(total / dt, 1),
            "rolls": _rolls_record()})

    # spatial 2x2 64-QAM 20 MHz (the bench shape) unrolled at 1024
    pcfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    np_bits = spatial.bits_per_frame(pcfg, 14)
    bits = jnp.asarray(rng.integers(0, 2, (1024, np_bits)).astype(np.int8))
    snr = jnp.full((1024,), 25.0, jnp.float32)

    def spatial_sim(key, bits, snr, cfg):
        return spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
            detector_type="MMSE")

    sim = lane_chunked(spatial_sim, 256, mode="unroll")

    def step(key):
        return jnp.sum(sim(key, bits, snr, pcfg).bit_errors)

    dt = _time_steps(step, _key(0), n_steps=8, n_rolls=2,
                     slow_step_s=1024 / 50000.0, max_extra_rolls=1)
    _rec("spatial_unrolled_4x256", {
        "ms_per_step": round(dt * 1e3, 2),
        "frames_per_s": round(1024 / dt, 1),
        "rolls": _rolls_record()})


def probe_siso_unroll():
    """Can unroll-chunking lift the SISO HEADLINE? Flat lane scaling is
    saturated at ~175-178k frames/s for 256..2048 lanes (VALIDATION.md:
    step = max(1.4 ms floor, lanes x ~5.7 us)) — if independent chunk
    subgraphs interleave the way SFBC's did (+36% over its knee), the
    per-lane 5.7 us should drop. Bench shape: 20 MHz 64-QAM, 14 symbols,
    bf16 default path."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.parallel.chunking import lane_chunked
    from ofdm_lte_tpu.sim import siso

    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    rng = np.random.default_rng(0)
    n = siso.bits_per_frame(cfg, 14)

    def siso_sim(key, bits, snr, cfg):
        return siso.simulate_siso(key, bits, snr, cfg)

    for total, chunk in ((512, 256), (1024, 256), (2048, 256)):
        bits = jnp.asarray(rng.integers(0, 2, (total, n)).astype(np.int8))
        snr = jnp.full((total,), 15.0, jnp.float32)
        sim = lane_chunked(siso_sim, chunk, mode="unroll")

        def step(key, bits=bits, snr=snr, sim=sim):
            r = sim(key, bits, snr, cfg)
            return jnp.sum(r.bit_errors), jnp.max(r.papr_db)

        dt = _time_steps(step, _key(0), n_steps=8, n_rolls=2,
                         slow_step_s=total / 100000.0, max_extra_rolls=1)
        _rec(f"siso_unrolled_{total // chunk}x{chunk}", {
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_s": round(total / dt, 1),
            "rolls": _rolls_record()})


def probe_coded():
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import coded

    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)

    for lanes in (128, 256):
        bits = jnp.asarray(rng.integers(0, 2, (lanes, 6000)).astype(np.int32))
        snr = jnp.full((lanes,), 5.0, jnp.float32)

        def step(key, bits=bits, snr=snr):
            r = coded.simulate_siso_coded_batched(key, bits, snr, cfg)
            return r.bit_errors, r.crc_pass

        dt = _time_steps(step, _key(0), n_steps=4, n_rolls=2,
                         slow_step_s=lanes / 700.0, max_extra_rolls=1)
        _rec(f"coded_flat_{lanes}", {
            "ms_per_step": round(dt * 1e3, 2),
            "tb_per_s": round(lanes / dt, 1),
            "rolls": _rolls_record()})

    bits2 = jnp.asarray(rng.integers(0, 2, (2, 128, 6000)).astype(np.int32))
    snr2 = jnp.full((128,), 5.0, jnp.float32)

    def step_chunked(key):
        def body(carry, xs):
            k, b = xs
            r = coded.simulate_siso_coded_batched(k, b, snr2, cfg)
            return carry + jnp.sum(r.bit_errors), 0

        keys = jax.random.split(key, 2)
        tot, _ = jax.lax.scan(body, jnp.int32(0), (keys, bits2))
        return tot

    dt = _time_steps(step_chunked, _key(0), n_steps=4, n_rolls=2,
                     slow_step_s=256 / 700.0, max_extra_rolls=1)
    _rec("coded_chunked_2x128", {
        "ms_per_step": round(dt * 1e3, 2),
        "tb_per_s": round(256 / dt, 1),
        "rolls": _rolls_record()})


def probe_sfbc_stages():
    """Stage bisection of the SFBC pipeline at 512 vs 1024 lanes: TX only,
    TX+channel, TX+channel+frame/DFT, full. Each isolated program pays the
    ~1.4 ms dispatch floor, so RATIOS across lane counts per stage matter,
    not absolute times."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import diversity
    from ofdm_lte_tpu.channel.mimo import mimo_mix_noiseless
    from ofdm_lte_tpu.channel.rayleigh import make_profile
    from ofdm_lte_tpu.ops import ofdm
    from ofdm_lte_tpu.grid import grid_for

    cfg = LTEConfig(bandwidth=10.0, modulation="16-QAM")
    g = grid_for(cfg)
    prof = make_profile("Pedestrian_A", cfg.fs, 3.0, 2.0)
    rng = np.random.default_rng(0)
    n = diversity.sfbc_bits_per_frame(cfg, 14)

    for lanes in (512, 1024):
        bits = jnp.asarray(rng.integers(0, 2, (lanes, n)).astype(np.int8))
        snr = jnp.full((lanes,), 15.0, jnp.float32)

        def tx_only(key):
            sig = diversity.sfbc_transmit(bits, cfg)
            return jnp.sum(sig.re[..., ::97], dtype=jnp.float32)

        def tx_channel(key):
            sig = diversity.sfbc_transmit(bits, cfg)
            y, _H, npow = mimo_mix_noiseless(key, sig, snr, 1,
                                             "rayleigh_mp", prof)
            return jnp.sum(y.re[..., ::97], dtype=jnp.float32)

        def tx_channel_dft(key):
            sig = diversity.sfbc_transmit(bits, cfg)
            y, _H, npow = mimo_mix_noiseless(key, sig, snr, 1,
                                             "rayleigh_mp", prof)
            yf = ofdm.frame_stream(y, cfg)
            dbins = diversity.sfbc_data_bins(cfg)
            yd = ofdm.demodulate_bins(yf, cfg, dbins)
            return jnp.sum(yd.re[..., ::13], dtype=jnp.float32)

        for name, fn in (("tx", tx_only), ("tx_ch", tx_channel),
                         ("tx_ch_dft", tx_channel_dft)):
            dt = _time_steps(fn, _key(0), n_steps=8, n_rolls=2,
                             max_extra_rolls=0)
            _rec(f"sfbc_stage_{name}_{lanes}", {
                "ms_per_step": round(dt * 1e3, 2),
                "rolls": _rolls_record()})


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    t0 = time.monotonic()
    if which in ("sfbc", "all"):
        probe_sfbc()
    if which in ("coded", "all"):
        probe_coded()
    if which in ("stages",):
        probe_sfbc_stages()
    if which in ("sfbc2",):
        probe_sfbc_variants()
    if which in ("unroll2",):
        probe_unroll2()
    if which in ("unroll3",):
        probe_unroll3()
    if which in ("siso_unroll",):
        probe_siso_unroll()
    _rec("wall_s", round(time.monotonic() - t0, 1))


if __name__ == "__main__":
    main()
