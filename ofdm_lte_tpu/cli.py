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
        return sim.simulate_siso_coded(bits, snr)
    if pipeline == "simo":
        return sim.simulate_simo(bits, snr, num_rx=args.num_rx)
    if pipeline == "miso":
        return sim.simulate_miso(bits, snr)
    if pipeline == "mimo":
        return sim.simulate_mimo(bits, snr, num_rx=args.num_rx)
    if pipeline == "beamforming":
        return sim.simulate_beamforming(bits, snr, num_tx=args.num_tx,
                                        num_rx=args.num_rx,
                                        codebook_type=args.codebook,
                                        update_mode=args.update_mode)
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
    workload = (f"{pipeline}/{cfg.modulation}/{cfg.bandwidth}/"
                f"{args.num_tx}x{args.num_rx}/{args.channel}")

    state = {"snr_db": list(map(float, snrs)), "errors": [0] * len(snrs),
             "total": [0] * len(snrs), "papr_db": [0.0] * len(snrs),
             "rounds": 0, "workload": workload}
    if args.checkpoint and os.path.exists(args.checkpoint):
        with open(args.checkpoint) as f:
            prev = json.load(f)
        if (prev.get("snr_db") == state["snr_db"]
                and prev.get("workload", workload) == workload):
            state = prev
            print(f"# resumed from {args.checkpoint} "
                  f"({state['rounds']} rounds done)", file=sys.stderr)

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
                             mode="sc-fdm" if args.sc_fdm else "lte")
        for i in range(len(snrs)):
            state["errors"][i] += int(r.bit_errors[i])
            state["total"][i] += int(r.total_bits[i])
            state["papr_db"][i] = float(r.papr_db[i])
        state["rounds"] += 1
        if args.checkpoint:
            with open(args.checkpoint, "w") as f:
                json.dump(state, f)

    bers = [e / t if t else 0.0 for e, t in zip(state["errors"],
                                                state["total"])]
    result = {"snr_db": state["snr_db"], "ber": bers,
              "total_bits": state["total"], "papr_db": state["papr_db"]}
    print(json.dumps(result, indent=2))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.semilogy(result["snr_db"], np.maximum(result["ber"], 1e-8), "o-")
        ax.set_xlabel("SNR (dB)")
        ax.set_ylabel("BER")
        ax.grid(True, which="both", alpha=0.4)
        ax.set_title(f"{cfg.modulation} {cfg.bandwidth} MHz {args.channel}")
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
                        choices=["siso", "siso-coded", "simo", "miso",
                                 "mimo", "beamforming", "spatial"])
        sp.add_argument("--num-tx", type=int, default=2, dest="num_tx")
        sp.add_argument("--num-rx", type=int, default=2, dest="num_rx")
        sp.add_argument("--rank", default="adaptive")
        sp.add_argument("--detector", default="MMSE",
                        choices=["MMSE", "ZF", "SIC", "MRC"])
        sp.add_argument("--codebook", default="TM6", choices=["TM6", "TM4"])
        sp.add_argument("--update-mode", default="adaptive",
                        dest="update_mode", choices=["adaptive", "static"])

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
                    choices=["siso", "simo", "sfbc", "spatial", "coded"])
    sp.add_argument("--tb-bits", type=int, default=6000, dest="tb_bits",
                    help="transport-block bits per frame (coded pipeline)")
    sp.add_argument("--num-tx", type=int, default=2, dest="num_tx")
    sp.add_argument("--num-rx", type=int, default=2, dest="num_rx")
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
