"""Command-line interface — the headless replacement for the reference's four
PyQt6 GUI applications (SIMO/, Tx_div/, Spatial/, Beamforming/).

Sub-commands cover the GUIs' workflows (SURVEY §2.7):

- run    : single simulation on any pipeline, metrics to stdout/JSON
           (the GUIs' "single sim" buttons)
- sweep  : BER-vs-SNR sweep — sharded across all devices with psum
           reductions, optional multi-modulation / multi-antenna grid like
           the SIMO GUI's full sweep (SIMO/gui/main_window.py:128-273),
           JSON + PNG output, checkpointable (resume accumulates error
           counts per SNR point)
- image  : transmit an image through a pipeline, reconstruct, report
           BER/PSNR/SSIM and save a side-by-side comparison PNG (the image
           workflow of every GUI)
- papr   : per-symbol PAPR CCDF for OFDM vs SC-FDM across modulations
           (ofdm_system.py:648-736)
- info   : print the derived LTE numerology for a profile

Usage: python -m ofdm_lte_tpu.cli <command> [options]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _mk_config(args):
    from .config import LTEConfig
    return LTEConfig(bandwidth=args.bandwidth, modulation=args.modulation,
                     cp_type=args.cp_type)


def _mk_sim(args):
    from .api import OFDMSimulator
    return OFDMSimulator(_mk_config(args), channel_type=args.channel,
                         mode="sc-fdm" if args.sc_fdm else "lte",
                         enable_sc_fdm=args.sc_fdm,
                         itu_profile=args.itu_profile,
                         velocity_kmh=args.velocity, seed=args.seed)


def _dispatch(sim, pipeline, bits, snr, args):
    if pipeline == "siso":
        return sim.simulate_siso(bits, snr)
    if pipeline == "siso-coded":
        return sim.simulate_siso_coded(bits, snr, rv=getattr(args, "rv", 0))
    if pipeline == "harq":
        return sim.simulate_siso_coded_harq(bits, snr)
    if pipeline == "simo":
        return sim.simulate_simo(bits, snr, num_rx=args.num_rx)
    if pipeline == "miso":
        return sim.simulate_miso(bits, snr)
    if pipeline == "mimo":
        return sim.simulate_mimo(bits, snr, num_rx=args.num_rx)
    if pipeline == "beamforming":
        return sim.simulate_beamforming(
            bits, snr, num_tx=args.num_tx, num_rx=args.num_rx,
            codebook_type=args.codebook, update_mode=args.update_mode,
            velocity_kmh=args.velocity if args.velocity else 3.0,
            channel_model=getattr(args, "channel_model", "static"))
    if pipeline == "spatial":
        return sim.simulate_spatial_multiplexing(
            bits, snr, num_tx=args.num_tx, num_rx=args.num_rx,
            rank=args.rank if args.rank == "adaptive" else int(args.rank),
            detector_type=args.detector)
    raise ValueError(pipeline)


def cmd_info(args):
    cfg = _mk_config(args)
    from .grid import grid_for
    from .utils.metrics import nominal_throughput_mbps
    info = cfg.get_info()
    g = grid_for(cfg)
    info["Data Subcarriers"] = g.num_data
    info["Pilot Subcarriers"] = g.num_pilot
    info["Guard Subcarriers"] = len(g.guard_idx)
    info["Nominal Throughput (Mbps)"] = round(nominal_throughput_mbps(cfg), 3)
    for k, v in info.items():
        print(f"  {k}: {v}")


def cmd_run(args):
    sim = _mk_sim(args)
    rng = np.random.default_rng(args.seed)
    bits = rng.integers(0, 2, args.num_bits).astype(np.int32)
    t0 = time.perf_counter()
    r = _dispatch(sim, args.pipeline, bits, args.snr, args)
    dt = time.perf_counter() - t0
    out = {k: v for k, v in r.items()
           if isinstance(v, (int, float, str, bool, list))}
    out["wall_time_s"] = round(dt, 3)
    print(json.dumps(out, indent=2, default=float))

    if args.constellation and "symbols_rx" in r:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        syms = np.asarray(r["symbols_rx"]).ravel()[:4000]
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(syms.real, syms.imag, s=2, alpha=0.4)
        from .ops.qam import constellation as qconst
        ideal = qconst(args.modulation)
        ax.scatter(ideal.real, ideal.imag, s=36, marker="x", color="red")
        ax.set_xlabel("I")
        ax.set_ylabel("Q")
        ax.set_title(f"{args.modulation} @ {args.snr} dB")
        ax.grid(alpha=0.3)
        ax.set_aspect("equal")
        fig.savefig(args.constellation, dpi=110)
        print(f"# constellation saved to {args.constellation}",
              file=sys.stderr)


def cmd_sweep(args):
    import jax
    from .parallel import sweep as psweep

    cfg = _mk_config(args)
    snrs = np.arange(args.snr_min, args.snr_max + 1e-9, args.snr_step)
    pipeline = getattr(args, "pipeline", "siso")
    if pipeline == "harq":
        return _cmd_sweep_harq(args, cfg, snrs)
    detector = getattr(args, "detector", "MMSE")
    rank = getattr(args, "rank", None)
    rank = None if rank in (None, "full", "adaptive") else int(rank)
    workload = (f"{pipeline}/{cfg.modulation}/{cfg.bandwidth}/"
                f"{args.num_tx}x{args.num_rx}/{args.channel}")
    if pipeline == "spatial":
        workload += f"/{detector}/r{rank if rank is not None else 'full'}"

    state = {"snr_db": list(map(float, snrs)), "errors": [0] * len(snrs),
             "total": [0] * len(snrs), "papr_db": [0.0] * len(snrs),
             "rounds": 0, "workload": workload, "round_bers": []}
    if args.checkpoint and os.path.exists(args.checkpoint):
        with open(args.checkpoint) as f:
            prev = json.load(f)
        if (prev.get("snr_db") == state["snr_db"]
                and prev.get("workload", workload) == workload):
            state = prev
            print(f"# resumed from {args.checkpoint} "
                  f"({state['rounds']} rounds done)", file=sys.stderr)
        else:
            print(f"# WARNING: checkpoint {args.checkpoint} holds a "
                  f"different workload/snr grid "
                  f"({prev.get('workload')!r} vs {workload!r}); "
                  f"accumulation restarts and the file will be "
                  f"overwritten", file=sys.stderr)

    mesh = (psweep.make_mesh_2d(args.snr_shards)
            if getattr(args, "snr_shards", 1) > 1 else None)
    key = jax.random.PRNGKey(args.seed + state["rounds"])
    for rnd in range(args.rounds):
        r = psweep.ber_sweep(jax.random.fold_in(key, rnd), cfg, snrs,
                             mesh=mesh,
                             frames_per_device=args.frames,
                             num_ofdm_symbols=args.num_symbols,
                             channel_type=args.channel,
                             itu_profile=args.itu_profile,
                             velocity_kmh=args.velocity,
                             pipeline=pipeline,
                             num_tx=args.num_tx, num_rx=args.num_rx,
                             coded_tb_bits=getattr(args, "tb_bits", 6000),
                             detector_type=detector, rank=rank,
                             frame_chunk=getattr(args, "frame_chunk", None),
                             mode="sc-fdm" if args.sc_fdm else "lte")
        for i in range(len(snrs)):
            state["errors"][i] += int(r.bit_errors[i])
            state["total"][i] += int(r.total_bits[i])
            state["papr_db"][i] = float(r.papr_db[i])
        state.setdefault("round_bers", []).append(
            [float(b) for b in np.asarray(r.ber)])
        state["rounds"] += 1
        if args.checkpoint:
            with open(args.checkpoint, "w") as f:
                json.dump(state, f)

    bers = [e / t if t else 0.0 for e, t in zip(state["errors"],
                                                state["total"])]
    ci = _sweep_ci(bers, state["total"], state.get("round_bers", []))
    result = {"snr_db": state["snr_db"], "ber": bers,
              "ber_ci95": ci["half_widths"], "ci_method": ci["method"],
              "total_bits": state["total"], "papr_db": state["papr_db"]}
    print(json.dumps(result, indent=2))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        b = np.maximum(result["ber"], 1e-8)
        ax.semilogy(result["snr_db"], b, "o-", label="BER")
        h = np.asarray(ci["half_widths"])
        lo = np.maximum(np.asarray(result["ber"]) - h, 1e-8)
        hi = np.maximum(np.asarray(result["ber"]) + h, 1e-8)
        ax.fill_between(result["snr_db"], lo, hi, alpha=0.25,
                        label=f"95% CI ({ci['method']})")
        ax.set_xlabel("SNR (dB)")
        ax.set_ylabel("BER")
        ax.grid(True, which="both", alpha=0.4)
        ax.legend()
        ax.set_title(f"{cfg.modulation} {cfg.bandwidth} MHz {args.channel}")
        fig.savefig(args.plot, dpi=110)
        print(f"# plot saved to {args.plot}", file=sys.stderr)


def _sweep_ci(bers, totals, round_bers):
    """95% CI half-widths per SNR point: the reference's t-distribution
    interval across Monte-Carlo rounds when >=2 rounds are banked
    (ofdm_system.py:495-504 via utils.metrics.ber_confidence_interval),
    else the binomial normal-approximation interval from the aggregated
    error counts (one round still yields an honest band)."""
    from .utils.metrics import ber_confidence_interval
    if round_bers and len(round_bers) >= 2:
        half = []
        for i in range(len(bers)):
            m, lo, hi = ber_confidence_interval([r[i] for r in round_bers])
            half.append(float(hi - m))
        return {"half_widths": half, "method": "t-dist over rounds"}
    half = [1.96 * float(np.sqrt(max(p * (1 - p), 0.0) / t)) if t else 0.0
            for p, t in zip(bers, totals)]
    return {"half_widths": half, "method": "binomial"}


def _cmd_sweep_harq(args, cfg, snrs):
    """HARQ BLER/avg-transmissions-vs-SNR sweep (sharded; the in-graph
    chase-combining schedule of sim.coded.simulate_siso_coded_harq_batched).
    Output: residual BLER after the full rv schedule, BLER after each
    combined stage, and mean transmissions per transport block."""
    import jax
    from .parallel import sweep as psweep

    rv_seq = tuple(int(x) for x in args.rv_sequence.split(","))
    workload = (f"harq/{cfg.modulation}/{cfg.bandwidth}/{args.channel}/"
                f"tb{args.tb_bits}/rv{','.join(map(str, rv_seq))}")
    T = len(rv_seq)
    state = {"snr_db": list(map(float, snrs)),
             "tb_failures": [0] * len(snrs),
             "stage_failures": [[0] * T for _ in snrs],
             "tx_sum": [0] * len(snrs), "errors": [0] * len(snrs),
             "frames": 0, "workload": workload}
    if args.checkpoint and os.path.exists(args.checkpoint):
        with open(args.checkpoint) as f:
            prev = json.load(f)
        if (prev.get("snr_db") == state["snr_db"]
                and prev.get("workload") == workload):
            state = prev
            print(f"# resumed from {args.checkpoint} "
                  f"({state['frames']} TBs/point done)", file=sys.stderr)
        else:
            print(f"# WARNING: checkpoint {args.checkpoint} holds a "
                  f"different workload/snr grid "
                  f"({prev.get('workload')!r} vs {workload!r}); "
                  f"accumulation restarts and the file will be "
                  f"overwritten", file=sys.stderr)

    mesh = (psweep.make_mesh_2d(args.snr_shards)
            if getattr(args, "snr_shards", 1) > 1 else None)
    key = jax.random.PRNGKey(args.seed)
    for rnd in range(args.rounds):
        r = psweep.harq_sweep(
            jax.random.fold_in(key, 7000 + state["frames"] + rnd), cfg,
            snrs, frames_per_device=args.frames, tb_bits=args.tb_bits,
            rv_sequence=rv_seq, mesh=mesh, channel_type=args.channel,
            itu_profile=args.itu_profile, velocity_kmh=args.velocity)
        # lossless accumulation from the sweep's exact psum-reduced integer
        # counters (the float ratios are derived views; round-tripping them
        # could drift by ±1 TB per round under checkpoint resume)
        for i in range(len(snrs)):
            state["tb_failures"][i] += int(r.tb_failures[i])
            for t in range(T):
                state["stage_failures"][i][t] += int(r.stage_failures[i, t])
            state["tx_sum"][i] += int(r.tx_sum[i])
            state["errors"][i] += int(r.bit_errors[i])
        state["frames"] += r.frames
        if args.checkpoint:
            with open(args.checkpoint, "w") as f:
                json.dump(state, f)

    n = max(state["frames"], 1)
    result = {
        "snr_db": state["snr_db"],
        "bler": [f / n for f in state["tb_failures"]],
        "bler_per_stage": [[f / n for f in row]
                           for row in state["stage_failures"]],
        "avg_transmissions": [s / n for s in state["tx_sum"]],
        "ber": [e / (n * args.tb_bits) for e in state["errors"]],
        "tbs_per_point": state["frames"],
        "rv_sequence": list(rv_seq),
    }
    print(json.dumps(result, indent=2))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        for t in range(T):
            ax.semilogy(result["snr_db"],
                        np.maximum([row[t] for row in
                                    result["bler_per_stage"]], 1e-8),
                        "o-", label=f"after tx {t + 1}")
        ax.set_xlabel("SNR (dB)")
        ax.set_ylabel("BLER")
        ax.grid(True, which="both", alpha=0.4)
        ax.legend()
        ax.set_title(f"HARQ {cfg.modulation} tb={args.tb_bits}")
        fig.savefig(args.plot, dpi=110)
        print(f"# plot saved to {args.plot}", file=sys.stderr)


def cmd_fullsweep(args):
    """The SIMO GUI's canonical 'full sweep' workload, headless:
    {QPSK, 16-QAM, 64-QAM} x {1, 2, 4, 8} RX x SNR range x iterations
    (/root/reference/SIMO/gui/main_window.py:128-273 — the BER-sweep
    wall-clock workload named in BASELINE.json). Each (modulation, num_rx)
    cell runs as ONE sharded Monte-Carlo program; rx=1 uses the SISO
    pipeline, rx>1 SIMO with MRC, exactly as the GUI dispatches."""
    import jax
    from .parallel import sweep as psweep
    from .config import LTEConfig

    snrs = np.arange(args.snr_min, args.snr_max + 1e-9, args.snr_step)
    mods = args.modulations.split(",")
    rx_list = [int(x) for x in args.rx_list.split(",")]
    key = jax.random.PRNGKey(args.seed)

    t0 = time.perf_counter()
    curves = {}
    for mi, mod in enumerate(mods):
        cfg = LTEConfig(bandwidth=args.bandwidth, modulation=mod,
                        cp_type=args.cp_type)
        for num_rx in rx_list:
            k = jax.random.fold_in(key, mi * 1000 + num_rx)
            r = psweep.ber_sweep(
                k, cfg, snrs,
                frames_per_device=args.iterations,
                num_ofdm_symbols=args.num_symbols,
                channel_type=args.channel, itu_profile=args.itu_profile,
                velocity_kmh=args.velocity,
                pipeline="siso" if num_rx == 1 else "simo",
                num_rx=num_rx)
            curves[f"{mod}/{num_rx}rx"] = {
                "snr_db": [float(s) for s in snrs],
                "ber": [float(b) for b in np.asarray(r.ber)],
                "total_bits": [int(t) for t in np.asarray(r.total_bits)],
            }
    dt = time.perf_counter() - t0
    out = {"curves": curves, "wall_time_s": round(dt, 3),
           "cells": len(curves), "snr_points": len(snrs),
           "frames_per_point": args.iterations * len(jax.devices())}
    print(json.dumps(out, indent=2))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 5))
        for label, c in curves.items():
            ax.semilogy(c["snr_db"], np.maximum(c["ber"], 1e-8),
                        "o-", label=label, markersize=3)
        ax.set_xlabel("SNR (dB)")
        ax.set_ylabel("BER")
        ax.grid(True, which="both", alpha=0.4)
        ax.legend(fontsize=7, ncol=len(mods))
        ax.set_title(f"full sweep, {args.bandwidth} MHz, {args.channel}")
        fig.savefig(args.plot, dpi=110)
        print(f"# plot saved to {args.plot}", file=sys.stderr)


def cmd_image(args):
    from .utils import image as img_utils
    sim = _mk_sim(args)
    original = img_utils.load_image(args.input)
    bits, meta = img_utils.image_to_bits(original)
    print(f"# image {original.shape} -> {len(bits)} bits", file=sys.stderr)
    t0 = time.perf_counter()
    r = _dispatch(sim, args.pipeline, bits.astype(np.int32), args.snr, args)
    dt = time.perf_counter() - t0
    received = img_utils.bits_to_image(r["bits_received_array"], meta)
    p = img_utils.psnr(original, received)
    s = img_utils.ssim(original, received)
    print(json.dumps({
        "ber": r["ber"], "bit_errors": r["bit_errors"],
        "psnr_db": p, "ssim": s, "snr_db": args.snr,
        "pipeline": args.pipeline, "wall_time_s": round(dt, 3),
    }, indent=2, default=float))
    if args.output:
        img_utils.save_comparison(original, received, args.output,
                                  title=f"{args.pipeline} @ {args.snr} dB")
        print(f"# comparison saved to {args.output}", file=sys.stderr)


# Published beamforming-vs-SFBC grid (single-realization reference run):
# /root/reference/results/beamforming/resultados_comparacion.txt:18-92.
# 1,620,000 bits, 64-QAM, 10 MHz, SNR 15 dB, 3 km/h, flat MIMO channel.
# Beamforming rows are ONE random-H realization each; the SFBC row is one
# run on the reference's deterministic fixed-phase AWGN-mode MIMO channel
# (and is reused verbatim for every RX count in the published file).
PUBLISHED_BF_COMPARISON = {
    ("sfbc", 2, 1): {"ber": 6.2885e-02, "psnr": 17.31},
    ("bf", 2, 1): {"ber": 3.4457e-02, "gain_db": 3.01, "psnr": 20.08},
    ("bf", 4, 1): {"ber": 7.3725e-02, "gain_db": 6.02, "psnr": 16.80},
    ("bf", 8, 1): {"ber": 1.2099e-04, "gain_db": 9.03, "psnr": 44.16},
    ("sfbc", 2, 2): {"ber": 6.2885e-02, "psnr": 17.31},
    ("bf", 2, 2): {"ber": 1.8597e-02, "gain_db": 1.15, "psnr": 22.71},
    ("bf", 4, 2): {"ber": 7.1790e-03, "gain_db": 3.21, "psnr": 26.93},
    ("bf", 8, 2): {"ber": 2.5617e-04, "gain_db": 6.28, "psnr": 40.65},
    ("sfbc", 2, 4): {"ber": 6.2885e-02, "psnr": 17.31},
    ("bf", 2, 4): {"ber": 3.8889e-03, "gain_db": 1.54, "psnr": 29.75},
    ("bf", 4, 4): {"ber": 8.0062e-04, "gain_db": 3.44, "psnr": 36.07},
    ("bf", 8, 4): {"ber": 6.5432e-05, "gain_db": 3.84, "psnr": 46.92},
}


def run_bf_comparison(bits: np.ndarray, snr_db: float, cfg, lanes: int = 16,
                      rx_list=(1, 2, 4), tx_list=(2, 4, 8), seed: int = 0):
    """The Beamforming GUI / test_beamforming_image.py comparison grid
    (Beamforming/gui/main_window.py:80,243-246): 2×RX SFBC baseline vs
    {2,4,8}×RX TM6 beamforming on the same bit payload.

    The reference runs each beamforming config ONCE (a single random flat
    H for the whole payload, ofdm_core.py:2347-2349), so its published BERs
    are samples of the conditional-BER-given-H distribution. Here each
    config runs `lanes` independent H realizations in one batched program
    and reports the median and the full spread — the published value is
    expected to fall inside the spread, not to match the median.

    Returns a list of row dicts (kind, num_tx, num_rx, ber_median, ber_min,
    ber_max, gain_db_mean, bits_rx of the median lane, ...).
    """
    import jax
    import jax.numpy as jnp
    from .sim import beamforming as bfs
    from .sim import diversity

    key = jax.random.PRNGKey(seed)
    n = len(bits)
    rows = []

    def pad_to(per):
        S = int(np.ceil(n / per))
        padded = np.zeros(S * per, np.int32)
        padded[:n] = bits
        return padded

    for num_rx in rx_list:
        # --- SFBC 2xRX baseline (deterministic fixed-phase AWGN channel:
        #     one run suffices; MC spread is noise-only)
        padded = pad_to(diversity.sfbc_bits_per_frame(cfg, 1))
        key, k = jax.random.split(key)
        r = diversity.simulate_sfbc(k, jnp.asarray(padded), snr_db, cfg,
                                    num_rx=num_rx, channel_type="awgn")
        bits_rx = np.asarray(r.bits_rx)[:n]
        errs = int(np.sum(bits_rx != bits))
        rows.append({
            "kind": "sfbc", "num_tx": 2, "num_rx": num_rx,
            "ber": errs / n, "bit_errors": errs, "bits_rx": bits_rx,
            "name": f"2x{num_rx} TX Diversity (SFBC)",
        })

        # --- beamforming grid, `lanes` H realizations per config
        padded = pad_to(bfs.bits_per_frame(cfg, 1))
        bb = jnp.broadcast_to(jnp.asarray(padded), (lanes, len(padded)))
        for num_tx in tx_list:
            key, k = jax.random.split(key)
            r = bfs.simulate_beamforming(k, bb, snr_db, cfg,
                                         num_tx=num_tx, num_rx=num_rx)
            ber_lanes = np.asarray(
                jnp.sum((r.bits_rx[:, :n] != jnp.asarray(bits)).astype(
                    jnp.int32), axis=-1)) / n
            med_lane = int(np.argsort(ber_lanes)[lanes // 2])
            rows.append({
                "kind": "bf", "num_tx": num_tx, "num_rx": num_rx,
                "ber": float(ber_lanes[med_lane]),
                "bit_errors": int(round(ber_lanes[med_lane] * n)),
                "ber_min": float(ber_lanes.min()),
                "ber_max": float(ber_lanes.max()),
                "ber_lanes": ber_lanes,
                "gain_db": float(np.mean(np.asarray(
                    r.beamforming_gain_db))),
                "bits_rx": np.asarray(r.bits_rx[med_lane, :n]),
                "name": f"{num_tx}x{num_rx} Beamforming",
            })
    return rows


def cmd_bfcompare(args):
    """End-to-end reproduction of the published beamforming-vs-SFBC table
    (results/beamforming/resultados_comparacion.txt) with Monte-Carlo
    spread over channel realizations."""
    from .utils import image as img_utils

    cfg = _mk_config(args)
    if args.input:
        original = img_utils.load_image(args.input)
        bits, meta = img_utils.image_to_bits(original)
        bits = bits.astype(np.int32)
        src = f"{args.input} {original.shape}"
    else:
        bits = np.random.default_rng(args.seed).integers(
            0, 2, args.num_bits).astype(np.int32)
        meta = None
        src = f"random ({args.num_bits} bits)"

    t0 = time.perf_counter()
    rows = run_bf_comparison(bits, args.snr, cfg, lanes=args.lanes,
                             seed=args.seed)
    dt = time.perf_counter() - t0

    lines = ["BEAMFORMING vs SFBC COMPARISON (ofdm_lte_tpu)",
             "=" * 78,
             f"Payload: {src}",
             f"Modulation: {cfg.modulation}  Bandwidth: {cfg.bandwidth} MHz"
             f"  SNR: {args.snr} dB  lanes/config: {args.lanes}",
             f"Published reference: results/beamforming/"
             f"resultados_comparacion.txt (single realization each)",
             ""]
    out_rows = []
    for row in rows:
        pub = PUBLISHED_BF_COMPARISON.get(
            (row["kind"], row["num_tx"], row["num_rx"]), {})
        entry = {k: v for k, v in row.items()
                 if k not in ("bits_rx", "ber_lanes")}
        entry["psnr_bits_db"] = img_utils.bit_psnr(bits, row["bits_rx"])
        if meta is not None:
            rec = img_utils.bits_to_image(row["bits_rx"], meta)
            entry["psnr_image_db"] = img_utils.psnr(original, rec)
        if pub:
            entry["published_ber"] = pub["ber"]
            if "ber_min" in row:
                entry["published_in_spread"] = bool(
                    row["ber_min"] <= pub["ber"] <= row["ber_max"])
        out_rows.append(entry)
        lines.append(f"{row['name']}:")
        lines.append(f"  BER: {entry['ber']:.4e}"
                     + (f"  (spread {row['ber_min']:.2e}..."
                        f"{row['ber_max']:.2e} over {args.lanes} channels)"
                        if "ber_min" in row else ""))
        lines.append(f"  Errores: {entry['bit_errors']:,} / {len(bits):,}")
        lines.append(f"  PSNR(bits): {entry['psnr_bits_db']:.2f} dB")
        if "gain_db" in entry:
            lines.append(f"  Array Gain: {entry['gain_db']:.2f} dB")
        if pub:
            lines.append(f"  Published: BER {pub['ber']:.4e}"
                         + (f", gain {pub['gain_db']:.2f} dB"
                            if "gain_db" in pub else "")
                         + (f"  [in spread: "
                            f"{entry.get('published_in_spread', 'n/a')}]"
                            if "published_in_spread" in entry else ""))
        lines.append("")
    lines.append(f"wall time: {dt:.1f} s")

    text = "\n".join(lines)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")
        print(f"# table saved to {args.output}", file=sys.stderr)
    print(json.dumps({"rows": out_rows, "wall_time_s": round(dt, 2)},
                     indent=2, default=float))
    print(text, file=sys.stderr)

    if getattr(args, "sweep_plot", None):
        _bf_sweep_overlay(args, cfg)


def _bf_sweep_overlay(args, cfg):
    """Beamforming-vs-SFBC BER curves over SNR in ONE figure — the
    Beamforming GUI's comparison sweep
    (/root/reference/Beamforming/gui/main_window.py:243-246), as sharded
    Monte-Carlo sweeps of the sfbc and beamforming pipelines."""
    import jax
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from .parallel import sweep as psweep

    snrs = np.arange(args.snr_min, args.snr_max + 1e-9, args.snr_step)
    key = jax.random.PRNGKey(args.seed + 99)
    fig, ax = plt.subplots(figsize=(7, 5))

    r = psweep.ber_sweep(jax.random.fold_in(key, 0), cfg, snrs,
                         frames_per_device=args.sweep_frames,
                         num_ofdm_symbols=14, pipeline="sfbc", num_rx=1)
    ax.semilogy(snrs, np.maximum(np.asarray(r.ber), 1e-8), "s--",
                label="2x1 SFBC (Alamouti)", color="black")

    for i, num_tx in enumerate((2, 4, 8)):
        r = psweep.ber_sweep(jax.random.fold_in(key, 1 + i), cfg, snrs,
                             frames_per_device=args.sweep_frames,
                             num_ofdm_symbols=14, pipeline="beamforming",
                             num_tx=num_tx, num_rx=1)
        ax.semilogy(snrs, np.maximum(np.asarray(r.ber), 1e-8), "o-",
                    label=f"{num_tx}x1 beamforming (TM6)")

    ax.set_xlabel("SNR (dB)")
    ax.set_ylabel("BER")
    ax.grid(True, which="both", alpha=0.4)
    ax.legend()
    ax.set_title(f"Beamforming vs SFBC, {cfg.modulation} "
                 f"{cfg.bandwidth} MHz")
    fig.savefig(args.sweep_plot, dpi=110)
    print(f"# sweep overlay saved to {args.sweep_plot}", file=sys.stderr)


def cmd_papr(args):
    import jax
    import jax.numpy as jnp
    from .sim import siso as siso_mod
    from .ops import ofdm as ofdm_ops
    from .utils.metrics import papr_ccdf
    from .config import LTEConfig

    out = {}
    curves = {}
    rng = np.random.default_rng(args.seed)
    for modulation in ["QPSK", "16-QAM"]:
        for mode in ["lte", "sc-fdm"]:
            cfg = LTEConfig(bandwidth=args.bandwidth, modulation=modulation)
            bits = rng.integers(
                0, 2, siso_mod.bits_per_frame(cfg, args.num_symbols, mode)
            ).astype(np.int32)
            sig = siso_mod.transmit(jnp.asarray(bits), cfg, mode)
            framed = ofdm_ops.frame_stream(sig, cfg)
            p = np.asarray(ofdm_ops.papr_db(framed, axis=-1))
            label = f"{modulation}/{'SC-FDM' if mode == 'sc-fdm' else 'OFDM'}"
            c = papr_ccdf(p)
            out[label] = {"mean_db": c["mean_db"], "p99_db": c["p99_db"]}
            curves[label] = c
    print(json.dumps(out, indent=2))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        for label, c in curves.items():
            ax.semilogy(c["thresholds_db"], np.maximum(c["ccdf"], 1e-6),
                        label=label)
        ax.set_xlabel("PAPR₀ (dB)")
        ax.set_ylabel("P(PAPR > PAPR₀)")
        ax.set_title(f"Per-symbol PAPR CCDF, {args.bandwidth} MHz")
        ax.grid(True, which="both", alpha=0.4)
        ax.legend()
        fig.savefig(args.plot, dpi=110)
        print(f"# plot saved to {args.plot}", file=sys.stderr)


def build_parser():
    p = argparse.ArgumentParser(prog="ofdm_lte_tpu",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--bandwidth", type=float, default=5.0)
        sp.add_argument("--modulation", default="QPSK",
                        choices=["QPSK", "16-QAM", "64-QAM"])
        sp.add_argument("--cp-type", default="normal", dest="cp_type")
        sp.add_argument("--channel", default="awgn",
                        choices=["awgn", "rayleigh_mp", "fading"])
        sp.add_argument("--itu-profile", default="Pedestrian_A",
                        dest="itu_profile")
        sp.add_argument("--velocity", type=float, default=None)
        sp.add_argument("--sc-fdm", action="store_true", dest="sc_fdm")
        sp.add_argument("--seed", type=int, default=0)

    def antennas(sp):
        sp.add_argument("--pipeline", default="siso",
                        choices=["siso", "siso-coded", "harq", "simo",
                                 "miso", "mimo", "beamforming", "spatial"])
        sp.add_argument("--num-tx", type=int, default=2, dest="num_tx")
        sp.add_argument("--num-rx", type=int, default=2, dest="num_rx")
        sp.add_argument("--rank", default="adaptive")
        sp.add_argument("--detector", default="MMSE",
                        choices=["MMSE", "MMSE-U", "ZF", "SIC", "MRC"])
        sp.add_argument("--codebook", default="TM6", choices=["TM6", "TM4"])
        sp.add_argument("--update-mode", default="adaptive",
                        dest="update_mode", choices=["adaptive", "static"])
        sp.add_argument("--rv", type=int, default=0, choices=[0, 1, 2, 3],
                        help="redundancy version (siso-coded pipeline)")
        sp.add_argument("--channel-model", default="static",
                        dest="channel_model", choices=["static", "jakes"],
                        help="beamforming channel: constant H (reference "
                             "parity) or Jakes time-varying with cadenced "
                             "precoder updates")

    sp = sub.add_parser("info", help="show derived LTE numerology")
    common(sp)
    sp.set_defaults(fn=cmd_info)

    sp = sub.add_parser("run", help="single simulation")
    common(sp)
    antennas(sp)
    sp.add_argument("--snr", type=float, default=10.0)
    sp.add_argument("--num-bits", type=int, default=100000, dest="num_bits")
    sp.add_argument("--constellation", default=None,
                    help="save RX constellation scatter PNG (siso pipeline)")
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("sweep", help="sharded BER-vs-SNR sweep")
    common(sp)
    sp.add_argument("--snr-min", type=float, default=0.0, dest="snr_min")
    sp.add_argument("--snr-max", type=float, default=20.0, dest="snr_max")
    sp.add_argument("--snr-step", type=float, default=2.0, dest="snr_step")
    sp.add_argument("--frames", type=int, default=4,
                    help="Monte-Carlo frames per device per round")
    sp.add_argument("--rounds", type=int, default=1)
    sp.add_argument("--num-symbols", type=int, default=28, dest="num_symbols")
    sp.add_argument("--plot", default=None, help="save BER curve PNG")
    sp.add_argument("--checkpoint", default=None,
                    help="JSON file to accumulate/resume sweep state")
    sp.add_argument("--pipeline", default="siso",
                    choices=["siso", "simo", "sfbc", "spatial", "coded",
                             "harq", "beamforming"])
    sp.add_argument("--tb-bits", type=int, default=6000, dest="tb_bits",
                    help="transport-block bits per frame "
                         "(coded/harq pipelines)")
    sp.add_argument("--rv-sequence", default="0,1,2,3", dest="rv_sequence",
                    help="HARQ redundancy-version schedule (harq pipeline)")
    sp.add_argument("--num-tx", type=int, default=2, dest="num_tx")
    sp.add_argument("--num-rx", type=int, default=2, dest="num_rx")
    sp.add_argument("--detector", default="MMSE",
                    choices=["MMSE", "MMSE-U", "IRC", "ZF", "SIC", "MRC"],
                    help="MIMO detector (spatial pipeline; MMSE-U = "
                         "unbiased MMSE, capability extension)")
    sp.add_argument("--rank", default=None,
                    help="spatial rank: integer or 'full' "
                         "(= min(num_tx, num_rx))")
    sp.add_argument("--frame-chunk", default=None, dest="frame_chunk",
                    type=lambda s: s if s == "auto" else int(s),
                    help="process each SNR point's frames in knee-sized "
                         "chunks: an int unrolls chunks of that size; "
                         "'auto' applies the measured per-pipeline policy "
                         "(unroll for sfbc/simo, sequential scan for "
                         "coded, flat otherwise; "
                         "parallel.chunking.auto_chunk, "
                         "results/cliff_probe.json)")
    sp.add_argument("--snr-shards", type=int, default=1, dest="snr_shards",
                    help="shard SNR points across this many mesh rows "
                         "(2-D snr x mc mesh; must divide device count)")
    sp.set_defaults(fn=cmd_sweep)

    sp = sub.add_parser(
        "fullsweep",
        help="SIMO-GUI canonical sweep: mods x RX counts x SNR")
    common(sp)
    sp.add_argument("--snr-min", type=float, default=0.0, dest="snr_min")
    sp.add_argument("--snr-max", type=float, default=20.0, dest="snr_max")
    sp.add_argument("--snr-step", type=float, default=2.0, dest="snr_step")
    sp.add_argument("--modulations", default="QPSK,16-QAM,64-QAM")
    sp.add_argument("--rx-list", default="1,2,4,8", dest="rx_list")
    sp.add_argument("--iterations", type=int, default=4,
                    help="Monte-Carlo frames per device per SNR point")
    sp.add_argument("--num-symbols", type=int, default=28, dest="num_symbols")
    sp.add_argument("--plot", default=None, help="save multi-curve BER PNG")
    sp.set_defaults(fn=cmd_fullsweep)

    sp = sub.add_parser("image", help="image round-trip through a pipeline")
    common(sp)
    antennas(sp)
    sp.add_argument("--snr", type=float, default=15.0)
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", default=None, help="comparison PNG path")
    sp.set_defaults(fn=cmd_image)

    sp = sub.add_parser(
        "bfcompare",
        help="beamforming-vs-SFBC grid vs the published table")
    common(sp)
    sp.add_argument("--snr", type=float, default=15.0)
    sp.add_argument("--num-bits", type=int, default=1620000, dest="num_bits",
                    help="payload size when no --input image is given "
                         "(default matches the published 450x450 image)")
    sp.add_argument("--input", default=None, help="image payload path")
    sp.add_argument("--lanes", type=int, default=16,
                    help="independent channel realizations per config")
    sp.add_argument("--output", default=None, help="text table path")
    sp.add_argument("--sweep-plot", default=None, dest="sweep_plot",
                    help="save the beamforming-vs-SFBC BER-vs-SNR overlay "
                         "PNG (the Beamforming GUI's comparison sweep)")
    sp.add_argument("--snr-min", type=float, default=0.0, dest="snr_min")
    sp.add_argument("--snr-max", type=float, default=20.0, dest="snr_max")
    sp.add_argument("--snr-step", type=float, default=2.0, dest="snr_step")
    sp.add_argument("--sweep-frames", type=int, default=4,
                    dest="sweep_frames",
                    help="Monte-Carlo frames per device per sweep point")
    sp.set_defaults(fn=cmd_bfcompare, bandwidth=10.0, modulation="64-QAM")

    sp = sub.add_parser("papr", help="PAPR CCDF OFDM vs SC-FDM")
    common(sp)
    sp.add_argument("--num-symbols", type=int, default=200,
                    dest="num_symbols")
    sp.add_argument("--plot", default=None, help="save PAPR CCDF PNG")
    sp.set_defaults(fn=cmd_papr)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
