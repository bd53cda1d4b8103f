"""Precision / kernel-backend study on the real TPU chip.

Measures, for each matmul-precision policy (and optionally the Gauss
3-multiply backend), the SISO headline throughput (20 MHz 64-QAM, 256
lanes) and the BER at the CLAUDE.md anchor points (5 MHz AWGN, 28 symbols)
across all modulations — the data needed to pick the supported default
precision (VERDICT round-1 item 2) with a parity guard.

Writes tools/precision_study.json incrementally. Safe to re-run: finished
entries are kept (keyed by label).
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "precision_study.json")
results = {}
if os.path.exists(OUT):
    results = json.load(open(OUT))


def save():
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)


def set_mode(precision, cmatmul=""):
    os.environ["OFDM_LTE_TPU_MATMUL_PRECISION"] = precision
    if cmatmul:
        os.environ["OFDM_LTE_TPU_CMATMUL"] = cmatmul
    else:
        os.environ.pop("OFDM_LTE_TPU_CMATMUL", None)
    jax.clear_caches()


def throughput():
    import bench
    from ofdm_lte_tpu import LTEConfig
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    fps, ber = bench.bench_siso(cfg, n_rolls=2)
    return {"frames_per_s": round(fps, 1), "ber_at_15db_20MHz": ber}


def ber_anchors():
    """BER at the CLAUDE.md anchors: 5 MHz AWGN, 28 symbols, 64 lanes."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.sim import siso
    out = {}
    lanes = 64
    for mod, snr in [("QPSK", 6.0), ("16-QAM", 14.0), ("64-QAM", 20.0)]:
        cfg = LTEConfig(bandwidth=5.0, modulation=mod)
        n_bits = siso.bits_per_frame(cfg, 28)
        rng = np.random.default_rng(42)
        bits = jnp.asarray(rng.integers(0, 2, (lanes, n_bits)).astype(np.int32))
        snrs = jnp.full((lanes,), snr, jnp.float32)
        r = siso.simulate_siso(jax.random.PRNGKey(7), bits, snrs, cfg)
        out[f"{mod}@{snr:g}dB"] = float(jnp.sum(r.bit_errors)) / (lanes * n_bits)
    return out


MODES = [
    ("highest", ""),
    ("default", ""),
    ("high", ""),
    ("highest", "gauss"),
    ("default", "gauss"),
]

if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for precision, cm in MODES:
        label = precision + ("+" + cm if cm else "")
        if only and only != label:
            continue
        if label in results and "error" not in results[label]:
            print(f"# {label}: cached", file=sys.stderr)
            continue
        print(f"# {label}: measuring", file=sys.stderr)
        set_mode(precision, cm)
        t0 = time.time()
        try:
            entry = throughput()
            entry.update(ber_anchors())
            entry["wall_s"] = round(time.time() - t0, 1)
            results[label] = entry
        except Exception as e:
            results[label] = {"error": str(e)[:300]}
        save()
        print(f"# {label}: {results[label]}", file=sys.stderr)
    print(json.dumps(results, indent=2))
