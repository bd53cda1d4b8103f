"""One-off TPU comparison of the modem's complex-matmul backends.

Runs bench.py's SISO headline (20 MHz 64-QAM, best-of-3 compiles, serialized
steps) in a fresh subprocess per backend — the backend choice is baked in at
trace time via OFDM_LTE_TPU_CMATMUL:

    xla4          4 real MXU matmuls (cplx.matmul, the default)
    gauss         3-multiply Gauss/Karatsuba form (-25% MXU FLOPs)
    pallas        fused Pallas kernel, 4 dots per tile pair
    pallas_gauss  fused Pallas kernel, 3 dots per tile pair

Usage: python tools/bench_cmatmul_backends.py [backend ...]
Writes results to stdout; used to pick the production default (see
ops/ofdm._cmm and the measured table in BASELINE.md).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

BACKENDS = ["xla4", "gauss", "pallas", "pallas_gauss"]


def run(backend: str) -> dict:
    env = dict(os.environ, OFDM_LTE_TPU_CMATMUL=backend)
    p = subprocess.run([sys.executable, BENCH, "--only-siso"], env=env,
                       capture_output=True, text=True, timeout=3600)
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
    try:
        out = json.loads(line)
    except Exception:
        out = {"error": (p.stderr or p.stdout)[-400:]}
    out["backend"] = backend
    return out


def main():
    backends = sys.argv[1:] or BACKENDS
    results = []
    for b in backends:
        print(f"# benching backend={b} ...", file=sys.stderr, flush=True)
        r = run(b)
        print(json.dumps(r), flush=True)
        results.append(r)
    ok = [r for r in results if "value" in r]
    if ok:
        best = max(ok, key=lambda r: r["value"])
        print(f"# best: {best['backend']} at {best['value']} frames/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
