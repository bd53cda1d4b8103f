"""Benchmark: OFDM frames/s/chip on the flagship pipelines (real TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline workload (20 MHz 64-QAM end-to-end SISO link) IMMEDIATELY after the
headline measurement finishes (the driver's capture must never lose it to a
timeout in the secondary entries), then writes BENCH_DETAILS.json
incrementally — one rewrite after every completed entry — for inspection.

Secondary entries run under a wall-clock budget (OFDM_BENCH_BUDGET_S,
default 2400 s measured from process start): before each entry the remaining
budget is checked against a conservative per-entry estimate and the entry is
skipped-and-recorded instead of started when it cannot fit.

A frame is one 14-symbol LTE subframe. Baseline denominators are the
reference NumPy implementation measured on this machine by
tools/measure_reference_baseline.py — see the REF_* constants below and
BASELINE.md "Measured on this machine" for both measurement dates (the
conservative, higher frames/s of the two is used).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compilation cache stabilizes repeat runs (compiles are slow and
# of variable quality through the remote-compile service)
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Denominators: the HIGHER (conservative) of the two measurement dates in
# BASELINE.md "Measured on this machine" — re-measure with
# tools/measure_reference_baseline.py.
REF_SISO_FPS = 4.135       # 20 MHz 64-QAM AWGN
REF_SPATIAL_FPS = 1.965    # 20 MHz 64-QAM 2x2 rank-2 MMSE
REF_SCFDM_FPS = 17.604     # 5 MHz 16-QAM SC-FDM AWGN (BASELINE.md)
REF_SIMO_FPS = 8.798       # 5 MHz QPSK 1x4 Rayleigh Ped-A (BASELINE.md)
REF_CODED_TBPS = 0.147     # 6000-bit TB, QPSK 5 MHz @5 dB, 8 iterations
# (the reference's 2x1 Alamouti path crashes as-shipped — no denominator)

DISPATCH_FLOOR_S = 1.4e-3   # serialized-step floor on this backend (a
#                             trivial scan body costs 1.3-1.5 ms/step,
#                             VALIDATION.md dispatch-floor analysis)
LANES = 256         # measured sweet spot (64->256 lanes: +48% frames/s;
                    # 384/512 lanes REGRESS: 129k/143k vs 147k f/s,
                    # tools/probe_lanes.py 2026-08-20)
NUM_SYMBOLS = 14

_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("OFDM_BENCH_BUDGET_S", "2400"))
_DETAILS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_DETAILS.json")
_details = {}


def _remaining_s():
    return BUDGET_S - (time.monotonic() - _T0)


def _record(name, value):
    """Add one entry and rewrite BENCH_DETAILS.json immediately, so a
    driver timeout mid-run loses at most the entry in flight."""
    _details[name] = value
    with open(_DETAILS_PATH, "w") as f:
        json.dump(_details, f, indent=2)


# Committed last-good store: the full roster (~20 live entries at ~230 s
# of TPU compile+measure each) no longer fits one OFDM_BENCH_BUDGET_S
# run, so budget-skipped entries surface their most recent verified
# measurement from this artifact (clearly dated + marked). Refresh with
# OFDM_BENCH_UPDATE_LAST_GOOD=1 (off by default so driver runs never
# dirty the working tree), typically via --entries=<skipped names>.
_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results", "bench_last_good.json")
_ENTRY_FILTER = None      # set from --entries=a,b,... in main()


def _last_good_store():
    try:
        with open(_LAST_GOOD_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _run_entry(name, fn, est_s):
    """Run one secondary bench entry under the wall-clock budget."""
    if _ENTRY_FILTER is not None and name not in _ENTRY_FILTER:
        return
    if _remaining_s() < est_s:
        rec = {"skipped": "budget",
               "remaining_s": round(_remaining_s(), 1),
               "estimate_s": est_s}
        lg = _last_good_store().get(name)
        if lg:
            rec["last_good"] = lg
        _record(name, rec)
        return
    try:
        out = fn()
        _record(name, out)
        if (os.environ.get("OFDM_BENCH_UPDATE_LAST_GOOD")
                and isinstance(out, dict)
                and not ({"skipped", "error"} & set(out))):
            store = _last_good_store()
            store[name] = {"measured": time.strftime("%Y-%m-%d"), **out}
            os.makedirs(os.path.dirname(_LAST_GOOD_PATH), exist_ok=True)
            with open(_LAST_GOOD_PATH, "w") as f:
                json.dump(store, f, indent=2)
    except Exception as e:  # never lose the run to a secondary failure
        _record(name, {"error": str(e)[:200]})


def _key(seed):
    """rbg-PRNG key: ~11% faster end-to-end than threefry on this backend
    (counter-based generation is cheaper on the VPU); statistical quality is
    ample for Monte-Carlo BER. Falls back to threefry if unavailable."""
    try:
        return jax.random.key(seed, impl="rbg")
    except Exception:
        return jax.random.PRNGKey(seed)


N_COMPILE_ROLLS = 3

# per-roll evidence of the most recent _time_steps call: the compile
# lottery's dispersion (VERDICT r2 task 7 — BENCH_r02 showed 1.70 vs
# 10.51 ms/step rolls of the same program). Bench entries attach this via
# _rolls_record() so artifacts show the spread behind each headline.
_LAST_ROLLS = []


def _rolls_record():
    """The last _time_steps call's rolls: [{ms_per_step, sig0, in_clique,
    chosen}] — copy, safe to embed in a details entry."""
    return [dict(r) for r in _LAST_ROLLS]


def _time_steps(fn, key, n_steps=20, slow_step_s=None, max_extra_rolls=2,
                n_rolls=N_COMPILE_ROLLS):
    """Steady-state per-step time with FORCED serialization, best of
    `n_rolls` independent compiles.

    slow_step_s: if every agreeing roll is slower than this per-step bound
    (i.e. all binaries were bad draws from the remote-compile lottery), run
    up to max_extra_rolls additional independent compiles before settling.

    fn(key) -> integer-reducible output. Steps are chained through a carry
    (each step's key depends on the previous step's result) inside one
    lax.scan, so the device cannot overlap them — the experimental backend
    otherwise pipelines independent dispatches and a naive Python loop
    over-reports throughput by 10-100x.

    The remote-compile service emits binaries of WILDLY variable quality:
    the same SISO program measured 110 vs 33,555 frames/s across compiles
    (2026-08-18) — including WRONG-but-fast binaries (a spatial roll ran
    260x faster than its siblings). Each roll here uses a different scan
    length, which changes the program hash, forcing an independent
    compilation; every roll also emits the per-step integer checksums, and
    only rolls from the single largest mutually-agreeing clique are
    eligible — the best binary in that clique defines the hardware number.
    """
    def make_run(steps):
        def body(carry, i):
            k = jax.random.fold_in(key, i + carry)
            out = fn(k)
            total = sum(jnp.sum(o).astype(jnp.int32)
                        for o in jax.tree.leaves(out))
            return total, total

        @jax.jit
        def run(key):
            final, ys = jax.lax.scan(body, jnp.int32(0), jnp.arange(steps))
            return final, ys
        return run

    timing_key = jax.random.fold_in(key, 999)
    max_rolls = n_rolls + (max_extra_rolls if slow_step_s is not None else 0)
    rolls = []   # (dt, signature tuple)

    def do_roll(roll):
        # the remote-compile service intermittently drops connections
        # (INTERNAL: response body closed); salt the scan length to force a
        # fresh program hash and retry instead of losing the whole entry
        last_err = None
        for attempt in range(3):
            steps = n_steps + roll + attempt * max_rolls
            run = make_run(steps)
            try:
                out = run(key)          # compile + warmup
                jax.block_until_ready(out)
                last_err = None
                break
            except Exception as e:      # pragma: no cover - transient infra
                last_err = e
                print(f"#   roll {roll} attempt {attempt} failed: "
                      f"{str(e)[:120]}", file=sys.stderr)
        if last_err is not None:
            return                      # give up on this roll, keep others
        t0 = time.perf_counter()
        final, ys = run(timing_key)
        # block on EVERY output inside the timed window: blocking on the
        # carry alone has been observed returning before execution
        # finished (sfbc roll measured 0.011 ms/step with CORRECT
        # checksums vs 7.01 ms for its clique peer, 2026-08-21 — a
        # false-timing artifact, not a wrong binary)
        jax.block_until_ready((final, ys))
        dt = (time.perf_counter() - t0) / steps
        # same timing_key + same carry recursion => the first n_steps
        # checksums must agree across correct binaries (up to reduction-
        # order jitter in the float->int bit decisions)
        sig = np.asarray(ys)[:n_steps].astype(np.float64)
        print(f"#   roll {roll}: {dt * 1e3:.2f} ms/step "
              f"sig0={sig[0]:.0f}", file=sys.stderr)
        rolls.append((dt, sig))

    def agree(a, b):
        return np.allclose(a, b, rtol=2e-3, atol=2.0)

    def settle():
        """(None, []) if no two rolls agree, else (fastest dt, clique) of
        ONE maximal mutually-agreeing clique. With extra rolls two disjoint
        2-roll groups can tie on peer count; taking min across the union
        would let a wrong-but-fast pair define the number, so the clique is
        anchored at the agreeing roll whose dt is closest to the median dt
        (a wrong-fast pair is by construction far from the median)."""
        n = len(rolls)
        peers = [sum(agree(rolls[i][1], rolls[j][1]) for j in range(n))
                 for i in range(n)]   # incl. self
        best_peers = max(peers)
        if best_peers == 1:
            return None, []
        med = sorted(dt for dt, _ in rolls)[n // 2]
        anchor = min((i for i in range(n) if peers[i] == best_peers),
                     key=lambda i: abs(rolls[i][0] - med))
        clique = [j for j in range(n) if agree(rolls[anchor][1],
                                               rolls[j][1])]
        # discard physically implausible timings INSIDE the clique: a roll
        # >20x faster than its agreeing peers' median is a false-timing
        # artifact (early block_until_ready return), not a fast binary
        cmed = sorted(rolls[j][0] for j in clique)[len(clique) // 2]
        sane = [j for j in clique if rolls[j][0] > cmed / 20.0]
        return min(rolls[j][0] for j in (sane or clique)), clique

    for roll in range(n_rolls):
        do_roll(roll)
    if not rolls:
        raise RuntimeError("all compile rolls failed (remote-compile flake)")

    best, clique = settle()
    extra = n_rolls
    while (slow_step_s is not None and extra < max_rolls
           and (best is None or best > slow_step_s)):
        print(f"#   best agreeing roll {'-' if best is None else best} "
              f"> {slow_step_s}s bound: rolling again", file=sys.stderr)
        do_roll(extra)
        extra += 1
        best, clique = settle()

    if best is None:   # no two rolls agree: distrust speed, use median
        print("#   WARNING: no checksum agreement across rolls; "
              "taking median time", file=sys.stderr)
        chosen_dt = sorted(dt for dt, _ in rolls)[len(rolls) // 2]
        clique = []
    else:
        chosen_dt = best
    _LAST_ROLLS[:] = [
        {"ms_per_step": round(dt * 1e3, 3), "sig0": float(sig[0]),
         "in_clique": i in clique, "chosen": dt == chosen_dt}
        for i, (dt, sig) in enumerate(rolls)]
    return chosen_dt


def _attach_spread(entry):
    """Summarize the compile-roll dispersion behind an entry (VERDICT r4
    task 7: record per-entry compile-count/variance so a future 25%
    regression in a secondary entry is detectable): min/max ms/step over
    the in-clique rolls (all rolls if no clique formed)."""
    rolls = entry.get("rolls") or []
    ms = [r["ms_per_step"] for r in rolls if r.get("in_clique")] or \
         [r["ms_per_step"] for r in rolls]
    if ms:
        entry["spread"] = {
            "n_rolls": len(rolls), "ms_min": min(ms), "ms_max": max(ms),
            "rel_spread": round((max(ms) - min(ms)) / max(min(ms), 1e-9),
                                3)}
    return entry


def _retry_slow(measure, fps_of, floor, attempts=2, wait_s=120,
                min_budget_s=600):
    """Generic slow-phase retry (previously headline+spatial only): the
    backend has multi-minute phases where known-good cached binaries run
    4-8x slow; if the measurement lands below the entry's known-good
    floor, wait and re-measure, keeping the best result and ALL rolls as
    evidence."""
    out = measure()
    rolls = list(out.get("rolls", []))
    a = 0
    while (fps_of(out) < floor and a < attempts
           and _remaining_s() > min_budget_s):
        a += 1
        print(f"# {fps_of(out):.0f} < slow-phase floor {floor:.0f}: "
              f"waiting {wait_s} s and re-measuring (attempt {a})",
              file=sys.stderr)
        time.sleep(wait_s)
        out2 = measure()
        rolls += out2.get("rolls", [])
        if fps_of(out2) > fps_of(out):
            out = out2
    out["rolls"] = rolls
    if a:
        out["slow_phase_attempts"] = a
    return _attach_spread(out)


def bench_siso(cfg, snr_db=15.0, lanes=LANES, n_rolls=N_COMPILE_ROLLS):
    from ofdm_lte_tpu.sim import siso

    rng = np.random.default_rng(0)
    n_bits = siso.bits_per_frame(cfg, NUM_SYMBOLS)
    # int8 bits: 1 B/bit HBM traffic through map/demap/error-count (the
    # sims follow the caller's dtype; see sim/siso.py)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, n_bits)).astype(np.int8))
    snr = jnp.full((lanes,), snr_db, jnp.float32)

    def step(key):
        r = siso.simulate_siso(key, bits, snr, cfg)
        return r.bit_errors, r.papr_db

    # known-good binaries run >=15k frames/s; <2k/s means every roll drew a
    # bad binary from the compile lottery - keep rolling (up to 2 extra)
    dt = _time_steps(step, _key(0), slow_step_s=lanes / 2000.0,
                     n_rolls=n_rolls)
    r = siso.simulate_siso(_key(7), bits, snr, cfg)
    ber = float(jnp.sum(r.bit_errors)) / (lanes * n_bits)
    return lanes / dt, ber


SPATIAL_LANES = 1024   # measured knee 2026-08-21 (bin-domain pipeline):
#                        256/512/1024 lanes -> 58.5k/64.0k/68.7k frames/s,
#                        results/spatial_lane_scaling.json


def bench_spatial(cfg, lanes=SPATIAL_LANES):
    from ofdm_lte_tpu.sim import spatial

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, spatial.bits_per_frame(cfg, NUM_SYMBOLS))
    ).astype(np.int8))
    snr = jnp.full((lanes,), 15.0, jnp.float32)

    def step(key):
        r = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
            detector_type="MMSE")
        return r.bit_errors

    # known-good bin-domain binaries run >=55k frames/s at 1024 lanes;
    # below ~25k every roll drew a bad binary - keep rolling
    dt = _time_steps(step, _key(0), n_steps=10, slow_step_s=lanes / 25000.0)
    return lanes / dt


def bench_spatial_4x4(cfg, lanes=512):
    """4x4 rank-4 MMSE spatial multiplexing — the block-Schur PLANE solve
    (mimo.detector.mmse4_planes, 5.3x the stacked gram+solve it replaced);
    the reference's capstone grid names this shape
    (/root/reference/test/test_spatial_multiplexing.py:229-237).
    Flat channel, so the bin-domain identity applies here too. Lanes:
    measured 31.8k/38.0k/37.6k frames/s at 256/512/1024 (2026-08-21) —
    512 is the knee."""
    from ofdm_lte_tpu.sim import spatial

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, spatial.bits_per_frame(cfg, NUM_SYMBOLS))
    ).astype(np.int8))
    snr = jnp.full((lanes,), 25.0, jnp.float32)

    def step(key):
        r = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=4, num_rx=4, rank=4,
            detector_type="MMSE")
        return r.bit_errors

    dt = _time_steps(step, _key(0), n_steps=10, n_rolls=2,
                     slow_step_s=lanes / 20000.0, max_extra_rolls=1)
    return {"frames_per_s": round(lanes / dt, 2), "lanes": lanes,
            "note": "rank-4 block-Schur plane MMSE (mmse4_planes)",
            "rolls": _rolls_record()}


def bench_spatial_mp(cfg, lanes=256):
    """2x2 spatial multiplexing over the MULTIPATH (rayleigh_mp) channel —
    the time-domain arbiter path with per-link Jakes fading
    (ofdm_core.py:2489-2816 + channel.py:397-493), previously unbenched
    (VERDICT r4 task 3). Heavier than the flat bin-domain pipeline: pays
    num_tx·num_rx Jakes legs + per-RX DFTs."""
    from ofdm_lte_tpu.sim import spatial

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, spatial.bits_per_frame(cfg, NUM_SYMBOLS))
    ).astype(np.int8))
    snr = jnp.full((lanes,), 25.0, jnp.float32)

    def step(key):
        r = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
            detector_type="MMSE", channel_type="rayleigh_mp",
            itu_profile="Pedestrian_A", velocity_kmh=3.0)
        return r.bit_errors

    dt = _time_steps(step, _key(0), n_steps=10, n_rolls=2,
                     slow_step_s=lanes / 12000.0, max_extra_rolls=1)
    return {"frames_per_s": round(lanes / dt, 2), "lanes": lanes,
            "vs_reference_cpu": round(lanes / dt / REF_SPATIAL_FPS, 2),
            "note": "rayleigh_mp Ped-A 3 km/h time-domain arbiter path "
                    "(flat-channel headline uses the bin-domain identity)",
            "rolls": _rolls_record()}


def bench_spatial_sic_4x4(cfg, lanes=512):
    """4x4 rank-4 SIC — the reference capstone's other detector
    (test_spatial_multiplexing.py:44-49) through the PLANE SIC
    (mimo.detector.sic_planes, round 5; previously fell through to the
    stacked layout shown 5.3x slower at rank 4)."""
    from ofdm_lte_tpu.sim import spatial

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, spatial.bits_per_frame(cfg, NUM_SYMBOLS))
    ).astype(np.int8))
    snr = jnp.full((lanes,), 25.0, jnp.float32)

    def step(key):
        r = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=4, num_rx=4, rank=4,
            detector_type="SIC")
        return r.bit_errors

    dt = _time_steps(step, _key(0), n_steps=10, n_rolls=2,
                     slow_step_s=lanes / 8000.0, max_extra_rolls=1)
    return {"frames_per_s": round(lanes / dt, 2), "lanes": lanes,
            "note": "plane SIC (sic_planes): 4 masked block-Schur stages "
                    "+ hard cancel in the Gram domain",
            "rolls": _rolls_record()}


def bench_beamforming(lanes=1024):
    """TM6 codebook beamforming 4x2 on the flat MIMO channel — the
    reference's frequency-domain path (ofdm_core.py:2260-2477: per-symbol
    CSI feedback + precode + MRC, no IFFT/CP), previously unbenched
    (VERDICT r4 tasks 3/5). Static (constant-H parity) mode plus the
    adaptive-Jakes extension mode (channel_model='jakes': per-symbol
    channel evolution + cadenced precoder recompute — the one pipeline
    with real per-symbol recompute load,
    BEAMFORMING_IMPLEMENTATION_SUMMARY.md:175-179)."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import beamforming as bfs

    cfg = LTEConfig(bandwidth=10.0, modulation="64-QAM")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, bfs.bits_per_frame(cfg, NUM_SYMBOLS))
    ).astype(np.int8))
    snr = jnp.full((lanes,), 15.0, jnp.float32)

    def step(key):
        r = bfs.simulate_beamforming(key, bits, snr, cfg, num_tx=4,
                                     num_rx=2)
        return r.bit_errors

    dt = _time_steps(step, _key(0), n_steps=10, n_rolls=2,
                     slow_step_s=lanes / 40000.0, max_extra_rolls=1)
    out = {"static": _attach_spread(
        {"frames_per_s": round(lanes / dt, 2),
         "lanes": lanes, "rolls": _rolls_record()})}

    from ofdm_lte_tpu.mimo.beamforming import update_period_symbols
    from ofdm_lte_tpu.config import doppler_hz
    period = update_period_symbols(120.0)
    fd = doppler_hz(120.0, 2.0)

    def step_jakes(key):
        r = bfs.simulate_beamforming_time_varying(
            key, bits, snr, cfg, num_tx=4, num_rx=2,
            update_period=period, doppler_hz=fd)
        return r.bit_errors

    try:
        dtj = _time_steps(step_jakes, _key(1), n_steps=10, n_rolls=2,
                          slow_step_s=lanes / 10000.0, max_extra_rolls=1)
        out["adaptive_jakes_120kmh"] = _attach_spread({
            "frames_per_s": round(lanes / dtj, 2), "lanes": lanes,
            "note": "Veh-B-speed Doppler: per-symbol precoder cadence",
            "rolls": _rolls_record()})
    except Exception as e:   # the extension mode must not sink the entry
        out["adaptive_jakes_120kmh"] = {"error": str(e)[:200]}
    return out


def bench_scfdm():
    """BASELINE.json config #2: SISO uplink SC-FDM, 16-QAM, 5 MHz, AWGN."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import siso

    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (LANES, siso.bits_per_frame(cfg, NUM_SYMBOLS, "sc-fdm"))
    ).astype(np.int8))
    snr = jnp.full((LANES,), 15.0, jnp.float32)

    def step(key):
        r = siso.simulate_siso(key, bits, snr, cfg, mode="sc-fdm")
        return r.bit_errors

    fps = LANES / _time_steps(step, _key(0), slow_step_s=LANES / 2000.0,
                              n_rolls=2)
    return {"frames_per_s": round(fps, 2),
            "vs_reference_cpu": round(fps / REF_SCFDM_FPS, 2),
            "rolls": _rolls_record()}


DIVERSITY_LANES = 512   # measured knee after the tap-hold optimization
#                         (2026-08-21): simo 67.6k/73.5k/73.7k f/s at
#                         256/512/1024 lanes; sfbc 70.8k/95.2k/50.9k —
#                         512 is the knee for both (sfbc REGRESSES at
#                         1024, like the coded 128->256 cliff)


def bench_simo(lanes=DIVERSITY_LANES):
    """BASELINE.json config #3: SIMO 1x4 MRC, QPSK, Rayleigh Ped-A."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import siso, diversity

    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, siso.bits_per_frame(cfg, NUM_SYMBOLS))).astype(np.int8))
    snr = jnp.full((lanes,), 10.0, jnp.float32)

    def step(key):
        r = diversity.simulate_simo(key, bits, snr, cfg, num_rx=4,
                                    channel_type="rayleigh_mp",
                                    itu_profile="Pedestrian_A",
                                    velocity_kmh=3.0)
        return r.bit_errors

    # known-good tap-hold binaries run >=67k frames/s; below 40k every
    # roll drew a bad binary or a slow phase - keep rolling
    fps = lanes / _time_steps(step, _key(0), n_steps=10,
                              slow_step_s=lanes / 40000.0, n_rolls=2)
    # channel-FIR roofline (VERDICT r3 task 2): the Jakes E@P matmul +
    # per-tap delayed FMA modeled against the measured step
    from ofdm_lte_tpu.precision import matmul_precision_name
    from ofdm_lte_tpu.utils.profiling import (simo_frame_cost,
                                              fir_roofline_report)
    rl = fir_roofline_report(
        simo_frame_cost(cfg, NUM_SYMBOLS, lanes, num_rx=4,
                        precision=matmul_precision_name()),
        measured_step_s=lanes / fps,
        precision=matmul_precision_name(),
        dispatch_floor_s=DISPATCH_FLOOR_S)
    return {"frames_per_s": round(fps, 2),
            "vs_reference_cpu": round(fps / REF_SIMO_FPS, 2),
            "roofline": {k: (round(v, 4) if isinstance(v, float) else v)
                         for k, v in rl.items()},
            "lanes": lanes,
            "rolls": _rolls_record()}


def bench_simo_chunked(lanes=1024, chunk=256):
    """SIMO 1x4 at 1024 lanes via unrolled knee-sized chunks — the
    unroll-chunking win transfers from SFBC (results/cliff_probe.json,
    2026-08-21: flat 1024 ~73.7k frames/s, unrolled 4x256 107.2k, +38%;
    2x256 at 512 lanes = 79.9k also beats the flat knee's 73.5k)."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.parallel.chunking import lane_chunked
    from ofdm_lte_tpu.sim import siso, diversity

    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, siso.bits_per_frame(cfg, NUM_SYMBOLS))).astype(np.int8))
    snr = jnp.full((lanes,), 10.0, jnp.float32)

    def sim(key, bits, snr, cfg):
        return diversity.simulate_simo(key, bits, snr, cfg, num_rx=4,
                                       channel_type="rayleigh_mp",
                                       itu_profile="Pedestrian_A",
                                       velocity_kmh=3.0)

    chunked = lane_chunked(sim, chunk, mode="unroll")

    def step(key):
        return chunked(key, bits, snr, cfg).bit_errors

    fps = lanes / _time_steps(step, _key(0), n_steps=10,
                              slow_step_s=lanes / 60000.0, n_rolls=2)
    return {"frames_per_s": round(fps, 2),
            "vs_reference_cpu": round(fps / REF_SIMO_FPS, 2),
            "lanes": lanes, "chunk": chunk, "mode": "unroll",
            "note": "lane_chunked unroll 4x256 (VERDICT r4 task 1)",
            "rolls": _rolls_record()}


def bench_sfbc(lanes=DIVERSITY_LANES):
    """BASELINE.json config #4: 2x1 Alamouti SFBC, 16-QAM, 10 MHz Rayleigh."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import diversity

    cfg = LTEConfig(bandwidth=10.0, modulation="16-QAM")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, diversity.sfbc_bits_per_frame(cfg, NUM_SYMBOLS))
    ).astype(np.int8))
    snr = jnp.full((lanes,), 15.0, jnp.float32)

    def step(key):
        r = diversity.simulate_sfbc(key, bits, snr, cfg, num_rx=1,
                                    channel_type="rayleigh_mp",
                                    itu_profile="Pedestrian_A",
                                    velocity_kmh=3.0)
        return r.bit_errors

    # known-good tap-hold binaries run >=70k frames/s at 512 lanes
    fps = lanes / _time_steps(step, _key(0), n_steps=10,
                              slow_step_s=lanes / 45000.0, n_rolls=2)
    from ofdm_lte_tpu.precision import matmul_precision_name
    from ofdm_lte_tpu.utils.profiling import (sfbc_frame_cost,
                                              fir_roofline_report)
    rl = fir_roofline_report(
        sfbc_frame_cost(cfg, NUM_SYMBOLS, lanes, num_rx=1,
                        precision=matmul_precision_name()),
        measured_step_s=lanes / fps,
        precision=matmul_precision_name(),
        dispatch_floor_s=DISPATCH_FLOOR_S)
    return {"frames_per_s": round(fps, 2),
            "note": "reference path crashes as-shipped; no denominator",
            "roofline": {k: (round(v, 4) if isinstance(v, float) else v)
                         for k, v in rl.items()},
            "lanes": lanes,
            "rolls": _rolls_record()}


def bench_coded():
    """Turbo-coded chain wall-clock: one 6000-bit transport block, QPSK
    5 MHz AWGN @5 dB, 8 decoder iterations — the BASELINE.md coded workload
    (reference NumPy: 6.8 s/TB on this machine's CPU). Host orchestration
    syncs every call, so this is honest serialized wall-clock."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import coded

    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 6000).astype(np.int32)
    key = jax.random.PRNGKey(0)

    r = coded.simulate_siso_coded(key, bits, 5.0, cfg)   # compile + warmup
    assert r.crc_pass
    n = 5
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        r = coded.simulate_siso_coded(jax.random.fold_in(key, i), bits,
                                      5.0, cfg)
        times.append(time.perf_counter() - t0)
    dt = sum(times) / n
    return {"transport_blocks_per_s": round(1.0 / dt, 3),
            "vs_reference_cpu": round(1.0 / dt / REF_CODED_TBPS, 1),
            "crc_pass": bool(r.crc_pass),
            "spread": {"n_iters": n,
                       "ms_min": round(min(times) * 1e3, 1),
                       "ms_max": round(max(times) * 1e3, 1),
                       "rel_spread": round(
                           (max(times) - min(times)) / min(times), 3)},
            "note": "serialized wall-clock incl. host CRC/segmentation"}


def bench_coded_batched():
    """Batched in-graph coded chain: 128 transport blocks (6000 bits each,
    QPSK 5 MHz AWGN @5 dB, 8 decoder iterations) as lanes of ONE XLA
    program — the TPU-native way to run coded Monte-Carlo (vs the
    host-orchestrated single-TB path of bench_coded). The decoder is the
    blocked-scan BCJR (coding/turbo.py impl='block'); it is LATENCY-bound
    well past 32 lanes, so wide lane counts are nearly free. The 128-lane
    operating point is the MEASURED knee (tools/probe_coded_lanes.py,
    2026-08-21: 933 TB/s at 64 lanes, 1741 at 128, 908 at 256 — the step
    time jumps 73->284 ms past 128; K=6144 runs 1570 TB/s at 128;
    results/coded_batch_scaling.json, surfaced into BENCH_DETAILS)."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import coded

    lanes = 128
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (lanes, 6000)).astype(np.int32))
    snr = jnp.full((lanes,), 5.0, jnp.float32)

    def step(key):
        r = coded.simulate_siso_coded_batched(key, bits, snr, cfg)
        return r.bit_errors, r.crc_pass

    # good binaries run this at ~74 ms/step (>1700 TB/s, 2026-08-20); bad
    # compile/runtime draws measure ~3x slower - keep rolling below 800 TB/s
    dt = _time_steps(step, _key(0), n_steps=5, n_rolls=2,
                     slow_step_s=lanes / 800.0)
    rolls = _rolls_record()
    r = coded.simulate_siso_coded_batched(_key(7), bits, snr, cfg)
    frac_pass = float(jnp.mean(r.crc_pass.astype(jnp.float32)))
    tb_per_s = lanes / dt
    return {"transport_blocks_per_s": round(tb_per_s, 2),
            "vs_reference_cpu": round(tb_per_s / REF_CODED_TBPS, 1),
            "crc_pass_fraction": frac_pass,
            "rolls": rolls,
            "note": f"{lanes} TBs/lane-batch, fully in-graph, blocked-scan "
                    "BCJR (simulate_siso_coded_batched)"}


def bench_sfbc_chunked(lanes=1024, chunk=256):
    """The SFBC 1024-lane CLIFF, fixed: 1024 lanes as UNROLLED knee-sized
    independent subgraphs inside one program
    (parallel.chunking.lane_chunked mode='unroll'). Measured root cause
    and fix (2026-08-21, results/cliff_probe.json): flat 1024 lanes
    collapses to 49.8k frames/s (20.6 ms/step vs 5.6 at 512 — per-lane
    cost 1.84x the knee's); unrolled chunks interleave and hide latency
    even the flat knee program pays. Chunk-size sweep at 1024 lanes:
    2x512 124.8k / 4x256 141.4k / 8x128 99.0k frames/s — 256 is the
    sweet chunk (the lax.scan variant's hard barrier manages only
    60.3k)."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.parallel.chunking import lane_chunked
    from ofdm_lte_tpu.sim import diversity

    cfg = LTEConfig(bandwidth=10.0, modulation="16-QAM")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(
        0, 2, (lanes, diversity.sfbc_bits_per_frame(cfg, NUM_SYMBOLS))
    ).astype(np.int8))
    snr = jnp.full((lanes,), 15.0, jnp.float32)

    def sim(key, bits, snr, cfg):
        return diversity.simulate_sfbc(key, bits, snr, cfg, num_rx=1,
                                       channel_type="rayleigh_mp",
                                       itu_profile="Pedestrian_A",
                                       velocity_kmh=3.0)

    chunked = lane_chunked(sim, chunk, mode="unroll")

    def step(key):
        return chunked(key, bits, snr, cfg).bit_errors

    fps = lanes / _time_steps(step, _key(0), n_steps=10,
                              slow_step_s=lanes / 60000.0, n_rolls=2)
    return {"frames_per_s": round(fps, 2),
            "lanes": lanes, "chunk": chunk, "mode": "unroll",
            "note": "lane_chunked unroll 2x512: beats the 512-lane knee "
                    "per-lane rate (VERDICT r4 task 1)",
            "rolls": _rolls_record()}


def bench_coded_chunked(lanes=256, chunk=128):
    """The 256-lane coded CLIFF, fixed: 256 TBs processed as 2x128
    knee-sized chunks chained through lax.map inside ONE program
    (parallel.chunking.lane_chunked). Measured root cause (2026-08-21,
    results/cliff_probe.json): the flat 256-lane block-BCJR program's
    step time QUADRUPLES (73.7 -> 282.5 ms, 1736 -> 906 TB/s) — per-lane
    cost doubles past the 128-lane knee — while 2x128 chunks run 142.7 ms
    = 2x the knee step + ~0 overhead, restoring LINEAR scaling
    (1795 TB/s at 256 lanes >= the 128-lane rate)."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.parallel.chunking import lane_chunked
    from ofdm_lte_tpu.sim import coded

    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (lanes, 6000)).astype(np.int32))
    snr = jnp.full((lanes,), 5.0, jnp.float32)
    # scan beats unroll here (1794.6 vs 1694.2 TB/s measured): two
    # block-BCJRs interleaved fight over VMEM rather than hide latency
    sim = lane_chunked(coded.simulate_siso_coded_batched, chunk,
                       mode="scan")

    def step(key):
        r = sim(key, bits, snr, cfg)
        return r.bit_errors, r.crc_pass

    dt = _time_steps(step, _key(0), n_steps=5, n_rolls=2,
                     slow_step_s=lanes / 800.0)
    rolls = _rolls_record()
    tb_per_s = lanes / dt
    return {"transport_blocks_per_s": round(tb_per_s, 2),
            "vs_reference_cpu": round(tb_per_s / REF_CODED_TBPS, 1),
            "lanes": lanes, "chunk": chunk, "mode": "scan",
            "rolls": rolls,
            "note": "lane_chunked scan 2x128: linear scaling past the "
                    "128-lane cliff (VERDICT r4 task 1)"}


def bench_sweep_wall_clock(cfg):
    """Wall-clock of a sharded Monte-Carlo BER sweep (5 SNR points x 8
    frames x 14 symbols) — the 'BER-sweep wall-clock' workload of
    BASELINE.json."""
    from ofdm_lte_tpu.parallel import sweep

    snrs = [5.0, 10.0, 15.0, 20.0, 25.0]
    key = jax.random.PRNGKey(0)
    r = sweep.ber_sweep(key, cfg, snrs, frames_per_device=8,
                        num_ofdm_symbols=14)   # compile+warmup
    jax.block_until_ready(r.ber)
    t0 = time.perf_counter()
    r = sweep.ber_sweep(jax.random.fold_in(key, 1), cfg, snrs,
                        frames_per_device=8, num_ofdm_symbols=14)
    jax.block_until_ready(r.ber)
    dt = time.perf_counter() - t0
    return {"seconds": round(dt, 3), "snr_points": 5, "frames": 40,
            "note": "sharded Monte-Carlo sweep, 20 MHz 64-QAM, 14-sym frames"}


def bench_batch_scaling(cfg):
    """On-chip batch-scaling: frames/s at small vs headline lane count.
    The ≥85% target (BASELINE.md:37) at '1 chip' is batching efficiency —
    throughput/lane at LANES lanes vs the peak-throughput regime. The other
    two regimes: 1 host / N virtual devices in
    tests/test_sweep.py::test_scaling_efficiency_on_virtual_mesh and N>=2
    processes in tests/test_multihost.py::test_multiprocess_scaling_efficiency
    (committed artifacts refreshed by tools/measure_scaling.py)."""
    out = {}
    for lanes in (64, LANES):
        fps, _ = bench_siso(cfg, lanes=lanes, n_rolls=2)
        out[f"lanes_{lanes}"] = {"frames_per_s": round(fps, 2),
                                 "per_lane": round(fps / lanes, 2),
                                 "rolls": _rolls_record()}
    big, small = out[f"lanes_{LANES}"], out["lanes_64"]
    out["throughput_gain"] = round(
        big["frames_per_s"] / small["frames_per_s"], 3)
    return out


def _alt_precision_siso(cfg, alt="highest"):
    """Measure the SISO headline at a non-default matmul precision in the
    SAME process: flip the env knob and jax.clear_caches() — precision is
    re-read at trace time, and the changed HLO gets its own persistent-
    cache key, so this forces honest recompilation (replaces round 1's
    fresh-subprocess rerun that double-paid every compile)."""
    from ofdm_lte_tpu.precision import matmul_precision
    prev = os.environ.get("OFDM_LTE_TPU_MATMUL_PRECISION")
    os.environ["OFDM_LTE_TPU_MATMUL_PRECISION"] = alt
    jax.clear_caches()
    try:
        fps, ber = bench_siso(cfg, n_rolls=2)
        return {"frames_per_s": round(fps, 2), "ber_at_15db": ber,
                "precision": alt,
                "vs_reference_cpu": round(fps / REF_SISO_FPS, 2),
                "rolls": _rolls_record()}
    finally:
        if prev is None:
            os.environ.pop("OFDM_LTE_TPU_MATMUL_PRECISION", None)
        else:
            os.environ["OFDM_LTE_TPU_MATMUL_PRECISION"] = prev
        jax.clear_caches()


def main():
    global _ENTRY_FILTER
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.precision import matmul_precision_name

    for a in sys.argv[1:]:
        # --entries=name1,name2: run ONLY the named BENCH_DETAILS entries
        # (tooling for refreshing results/bench_last_good.json; combine
        # with OFDM_BENCH_UPDATE_LAST_GOOD=1). Skips the headline unless
        # siso_20MHz_64QAM is listed.
        if a.startswith("--entries="):
            _ENTRY_FILTER = set(a.split("=", 1)[1].split(","))

    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    precision = matmul_precision_name()

    # ---- headline: measure, PRINT, record — before anything else ----
    # Slow-phase retry: the backend service intermittently enters multi-
    # minute phases where EVERY roll of known-good cached binaries runs
    # 4-8x slow (measured 2026-08-21: 14.3/7.7/8.6 ms/step, then the same
    # binaries at 1.74 ms ten minutes later). Best-of-rolls cannot save a
    # run that lands entirely inside such a phase, so if the headline comes
    # out far below the established anchor for the active precision, wait
    # and re-measure (keeping the best attempt and all rolls as evidence).
    slow_floor = {"default": 60000.0, "high": 35000.0,
                  "highest": 35000.0}.get(precision, 0.0)
    if _ENTRY_FILTER is not None and "siso_20MHz_64QAM" not in _ENTRY_FILTER:
        siso_fps, siso_ber = float("nan"), None   # filtered tooling run
    else:
        siso_fps, siso_ber = bench_siso(cfg)
        siso_rolls = _rolls_record()
        attempt = 0
        while (siso_fps < slow_floor and attempt < 2
               and _remaining_s() > 900):
            attempt += 1
            print(f"# headline {siso_fps:.0f} f/s < slow-phase floor "
                  f"{slow_floor:.0f}: waiting 120 s and re-measuring "
                  f"(attempt {attempt})", file=sys.stderr)
            time.sleep(120)
            fps2, ber2 = bench_siso(cfg, n_rolls=2)
            siso_rolls += _rolls_record()
            if fps2 > siso_fps:
                siso_fps, siso_ber = fps2, ber2
        print(json.dumps({
            "metric": "ofdm_frames_per_s_per_chip_20MHz_64QAM_siso",
            "value": round(siso_fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(siso_fps / REF_SISO_FPS, 2),
        }), flush=True)
        if "--only-siso" in sys.argv:  # headline only (backend A/B tooling)
            return
        _record("siso_20MHz_64QAM", {
            "frames_per_s": round(siso_fps, 2),
            "vs_reference_cpu": round(siso_fps / REF_SISO_FPS, 2),
            "ber_at_15db": siso_ber,
            "precision": precision,
            "rolls": siso_rolls,
        })

    # ---- secondary entries, cheapest/highest-value first, under budget ----
    def roofline():
        from ofdm_lte_tpu.utils.profiling import roofline_report
        rl = roofline_report(cfg, NUM_SYMBOLS, LANES,
                             measured_step_s=LANES / siso_fps,
                             precision=precision,
                             dispatch_floor_s=DISPATCH_FLOOR_S)
        return {k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in rl.items()}

    _run_entry("siso_roofline", roofline, est_s=5)

    alt = "highest" if precision != "highest" else "default"
    _run_entry(f"siso_20MHz_64QAM_{alt}_precision",
               lambda: _alt_precision_siso(cfg, alt), est_s=500)

    # roofline at the alternate precision too: at bf16 the same absolute
    # dispatch/fusion overhead is a larger share of the (much shorter)
    # step, so the multi-pass parity mode is the cleaner kernel-quality
    # indicator while the bf16 default is the throughput number
    alt_entry = _details.get(f"siso_20MHz_64QAM_{alt}_precision", {})
    if "frames_per_s" in alt_entry:
        def roofline_alt():
            from ofdm_lte_tpu.utils.profiling import roofline_report
            rl = roofline_report(
                cfg, NUM_SYMBOLS, LANES,
                measured_step_s=LANES / alt_entry["frames_per_s"],
                precision=alt,
                dispatch_floor_s=DISPATCH_FLOOR_S)
            return {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in rl.items()}
        _run_entry(f"siso_roofline_{alt}", roofline_alt, est_s=5)

    # parity guard: identical bits+key, only matmul rounding differs
    # between the two precision entries — BERs must agree tightly
    if "ber_at_15db" in alt_entry and siso_ber is not None:
        delta = abs(alt_entry["ber_at_15db"] - siso_ber)
        _record("precision_parity", {
            "ber_default_mode": siso_ber if precision == "default"
            else alt_entry["ber_at_15db"],
            "ber_highest_mode": alt_entry["ber_at_15db"]
            if alt == "highest" else siso_ber,
            "abs_delta": delta,
            "parity_ok": bool(delta < 0.02 * max(siso_ber, 1e-6)),
        })

    def spatial_entry():
        # slow-phase retry, as for the headline: known-good bin-domain
        # binaries run 58-69k frames/s (results/spatial_lane_scaling.json);
        # if every roll lands far below that the backend is in a degraded
        # phase - wait and re-measure rather than record a phase artifact
        fps = bench_spatial(cfg)
        rolls = _rolls_record()
        attempt = 0
        while fps < 45000.0 and attempt < 2 and _remaining_s() > 600:
            attempt += 1
            print(f"# spatial {fps:.0f} f/s < slow-phase floor 45000: "
                  f"waiting 120 s and re-measuring (attempt {attempt})",
                  file=sys.stderr)
            time.sleep(120)
            fps2 = bench_spatial(cfg)
            rolls += _rolls_record()
            fps = max(fps, fps2)
        return {"frames_per_s": round(fps, 2),
                "lanes": SPATIAL_LANES,
                "vs_reference_cpu": round(fps / REF_SPATIAL_FPS, 2),
                "rolls": rolls}

    # ---- round-5 story first: diversity knees + chunked lanes + the
    # coded chain. The full roster (~20 live entries at ~200-250 s of
    # compile+measure each) exceeds one OFDM_BENCH_BUDGET_S run, so the
    # order is value-ranked and budget-skipped tail entries surface
    # their committed last-good measurement instead (bench_last_good).
    fps = lambda o: o.get("frames_per_s", 0.0)            # noqa: E731
    _run_entry("sfbc_2x1_rayleigh_10MHz_16QAM",
               lambda: _retry_slow(bench_sfbc, fps, 70000.0), est_s=300)
    _run_entry("sfbc_2x1_chunked_1024_10MHz_16QAM",
               lambda: _retry_slow(bench_sfbc_chunked, fps, 80000.0),
               est_s=400)
    _run_entry("simo_1x4_rayleigh_5MHz_QPSK",
               lambda: _retry_slow(bench_simo, fps, 55000.0), est_s=300)
    _run_entry("simo_1x4_chunked_1024_5MHz_QPSK",
               lambda: _retry_slow(bench_simo_chunked, fps, 60000.0),
               est_s=400)
    _run_entry("coded_batched_5MHz_QPSK_6000bit_TB",
               lambda: _retry_slow(
                   bench_coded_batched,
                   lambda o: o.get("transport_blocks_per_s", 0.0), 1000.0),
               est_s=700)   # block-BCJR compiles are big: ~120-320 s each
    _run_entry("coded_chunked_256_5MHz_QPSK_6000bit_TB",
               lambda: _retry_slow(
                   bench_coded_chunked,
                   lambda o: o.get("transport_blocks_per_s", 0.0), 1000.0),
               est_s=500)

    _run_entry("spatial_2x2_20MHz_64QAM", spatial_entry, est_s=400)

    # roofline accounting for the spatial north-star (VERDICT r3 task 1):
    # complete-program cost model of the bin-domain pipeline vs the
    # measured step, with the serialized-dispatch floor isolated
    sp_entry = _details.get("spatial_2x2_20MHz_64QAM", {})
    if "frames_per_s" in sp_entry:
        def spatial_roofline():
            from ofdm_lte_tpu.utils.profiling import spatial_roofline_report
            rl = spatial_roofline_report(
                cfg, NUM_SYMBOLS, SPATIAL_LANES,
                measured_step_s=SPATIAL_LANES / sp_entry["frames_per_s"],
                precision=precision, dispatch_floor_s=DISPATCH_FLOOR_S)
            return {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in rl.items()}
        _run_entry("spatial_roofline", spatial_roofline, est_s=5)
    # secondary entries get the headline's slow-phase retry (re-measure
    # after a wait when below the entry's known-good floor) + a rolls
    # spread summary (VERDICT r4 task 7)
    _run_entry("spatial_4x4_20MHz_64QAM",
               lambda: _retry_slow(lambda: bench_spatial_4x4(cfg), fps,
                                   25000.0), est_s=300)
    _run_entry("spatial_sic_4x4_20MHz_64QAM",
               lambda: _retry_slow(lambda: bench_spatial_sic_4x4(cfg), fps,
                                   8000.0), est_s=300)
    _run_entry("spatial_2x2_rayleigh_mp_20MHz_64QAM",
               lambda: _retry_slow(lambda: bench_spatial_mp(cfg), fps,
                                   5000.0), est_s=300)
    _run_entry("beamforming_4x2_10MHz_64QAM", bench_beamforming, est_s=400)
    _run_entry("coded_5MHz_QPSK_6000bit_TB", bench_coded, est_s=300)
    _run_entry("scfdm_siso_5MHz_16QAM",
               lambda: _retry_slow(bench_scfdm, fps, 120000.0), est_s=300)
    _run_entry("ber_sweep_wall_clock", lambda: bench_sweep_wall_clock(cfg),
               est_s=200)
    _run_entry("siso_batch_scaling", lambda: bench_batch_scaling(cfg),
               est_s=400)

    # committed offline-measured scaling artifacts (tools/probe_*_lanes.py)
    # surfaced into BENCH_DETAILS so every run's record is self-contained
    for name, fname in (("spatial_lane_scaling",
                         "spatial_lane_scaling.json"),
                        ("coded_batch_scaling",
                         "coded_batch_scaling.json"),
                        ("diversity_lane_scaling",
                         "diversity_lane_scaling.json"),
                        ("cliff_probe", "cliff_probe.json"),
                        ("machine_peaks", "machine_peaks.json")):
        p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "results", fname)
        if os.path.exists(p):
            with open(p) as f:
                _record(name, {"source": f"results/{fname} (offline probe)",
                               **json.load(f)})

    _record("wall_clock_s", round(time.monotonic() - _T0, 1))


if __name__ == "__main__":
    main()
