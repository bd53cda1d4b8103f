"""High-level API facade, metrics, image utils, CLI plumbing."""
import json
import os

import numpy as np
import pytest

from ofdm_lte_tpu import LTEConfig, cplx
from ofdm_lte_tpu.api import OFDMModule, OFDMSimulator, create_simulator
from ofdm_lte_tpu.utils import image as img_utils
from ofdm_lte_tpu.utils import metrics


def test_ofdm_module_transmit():
    m = OFDMModule(LTEConfig(bandwidth=5.0, modulation="QPSK"))
    bits = np.random.default_rng(0).integers(0, 2, 10000)
    r = m.transmit(bits, snr_db=30.0)
    assert r["ber"] == 0.0
    assert r["transmitted_bits"] == 10000
    assert len(r["bits_received_array"]) == 10000
    assert r["papr_db"] > 3.0


def test_ofdm_module_sweep():
    m = OFDMModule(LTEConfig(bandwidth=1.25, modulation="QPSK"))
    bits = np.random.default_rng(0).integers(0, 2, 3000)
    calls = []
    r = m.run_ber_sweep(bits, [0.0, 60.0], num_trials=1,
                        progress_callback=lambda i, n: calls.append((i, n)))
    assert r["ber_values"][0] > r["ber_values"][1] == 0.0
    assert calls == [(1, 2), (2, 2)]


def test_simulator_all_pipelines_smoke():
    sim = OFDMSimulator(LTEConfig(bandwidth=5.0, modulation="QPSK"))
    bits = np.random.default_rng(1).integers(0, 2, 5000)
    assert sim.simulate_siso(bits, 40.0)["ber"] == 0.0
    assert sim.simulate_simo(bits, 40.0, num_rx=2)["ber"] == 0.0
    assert sim.simulate_miso(bits, 40.0)["ber"] == 0.0
    assert sim.simulate_mimo(bits, 40.0, num_rx=2)["ber"] == 0.0
    assert sim.simulate_beamforming(bits, 40.0, num_tx=2)["ber"] == 0.0
    r = sim.simulate_spatial_multiplexing(bits, 40.0, num_tx=2, num_rx=2,
                                          rank=2)
    assert r["ber"] < 0.02
    rc = sim.simulate_siso_coded(bits[:2000], 20.0)
    assert rc["crc_pass"] and rc["ber"] == 0.0


def test_create_simulator_presets():
    sim = create_simulator("20MHz_64QAM")
    assert sim.config.bandwidth == 20.0
    assert sim.config.modulation == "64-QAM"
    with pytest.raises(ValueError):
        create_simulator("3MHz_BPSK")


def test_reproducible_with_seed():
    bits = np.random.default_rng(2).integers(0, 2, 5000)
    r1 = OFDMSimulator(LTEConfig(), seed=7).simulate_siso(bits, 8.0)
    r2 = OFDMSimulator(LTEConfig(), seed=7).simulate_siso(bits, 8.0)
    assert r1["ber"] == r2["ber"]
    np.testing.assert_array_equal(r1["bits_received_array"],
                                  r2["bits_received_array"])


# ---------------------------------------------------------------------------
# utils
# ---------------------------------------------------------------------------

def test_image_bits_roundtrip(rng):
    img = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    bits, meta = img_utils.image_to_bits(img)
    assert len(bits) == 20 * 30 * 3 * 8
    back = img_utils.bits_to_image(bits, meta)
    np.testing.assert_array_equal(back, img)


def test_psnr_ssim(rng):
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    assert img_utils.psnr(img, img) == float("inf")
    assert img_utils.ssim(img, img) > 0.999
    noisy = np.clip(img.astype(int)
                    + rng.integers(-20, 20, img.shape), 0, 255).astype(np.uint8)
    p = img_utils.psnr(img, noisy)
    assert 20 < p < 40
    assert img_utils.ssim(img, noisy) < 0.999


def test_metrics_ber_ci():
    m, lo, hi = metrics.ber_confidence_interval([0.01, 0.012, 0.009, 0.011])
    assert lo < m < hi
    assert abs(m - 0.0105) < 1e-9


def test_metrics_evm_ser(rng):
    from ofdm_lte_tpu.ops import qam
    import jax.numpy as jnp
    bits = rng.integers(0, 2, 4000).astype(np.int32)
    tx = qam.modulate(jnp.asarray(bits), "16-QAM")
    assert metrics.evm_percent(tx, tx) == 0.0
    assert metrics.ser(tx, tx, "16-QAM") == 0.0
    noisy = cplx.from_numpy(tx.to_numpy()
                            + 0.05 * (rng.standard_normal(1000)
                                      + 1j * rng.standard_normal(1000)))
    assert 0 < metrics.evm_percent(tx, noisy) < 30


def test_nominal_throughput():
    # 5 MHz QPSK: 249 data bins · 2 bits / 71.35 µs ≈ 7 Mbps
    t = metrics.nominal_throughput_mbps(LTEConfig(bandwidth=5.0))
    assert 5.0 < t < 9.0


def test_papr_ccdf(rng):
    samples = rng.normal(8.0, 1.0, 1000)
    c = metrics.papr_ccdf(samples)
    assert 0.9 < np.interp(5.0, c["thresholds_db"], c["ccdf"]) <= 1.0
    assert c["ccdf"][-1] < 0.1


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_info(capsys):
    from ofdm_lte_tpu.cli import main
    main(["info", "--bandwidth", "10", "--modulation", "64-QAM"])
    out = capsys.readouterr().out
    assert "FFT Points (N): 1024" in out
    assert "Data Subcarriers: 499" in out


def test_cli_run(capsys):
    from ofdm_lte_tpu.cli import main
    main(["run", "--pipeline", "siso", "--snr", "40", "--num-bits", "5000",
          "--bandwidth", "1.25"])
    out = json.loads(capsys.readouterr().out)
    assert out["ber"] == 0.0


def test_cli_sweep_checkpoint(tmp_path, capsys):
    from ofdm_lte_tpu.cli import main
    ck = str(tmp_path / "ck.json")
    args = ["sweep", "--snr-min", "0", "--snr-max", "6", "--snr-step", "6",
            "--frames", "1", "--num-symbols", "14", "--bandwidth", "1.25",
            "--checkpoint", ck]
    main(args)
    r1 = json.loads(capsys.readouterr().out)
    main(args)
    r2 = json.loads(capsys.readouterr().out)
    assert r2["total_bits"][0] == 2 * r1["total_bits"][0]  # accumulated


def test_cli_sweep_pipeline_simo(tmp_path, capsys):
    from ofdm_lte_tpu.cli import main
    main(["sweep", "--snr-min", "30", "--snr-max", "30", "--snr-step", "1",
          "--frames", "1", "--num-symbols", "14", "--bandwidth", "1.25",
          "--pipeline", "simo", "--num-rx", "2"])
    r = json.loads(capsys.readouterr().out)
    assert r["ber"][0] < 0.01


def test_cli_fullsweep(tmp_path, capsys):
    # the SIMO GUI's canonical workload, shrunk (main_window.py:128-273)
    from ofdm_lte_tpu.cli import main
    plot = str(tmp_path / "curves.png")
    main(["fullsweep", "--bandwidth", "1.25", "--modulations", "QPSK",
          "--rx-list", "1,2", "--snr-min", "0", "--snr-max", "8",
          "--snr-step", "8", "--iterations", "1", "--num-symbols", "14",
          "--plot", plot])
    r = json.loads(capsys.readouterr().out)
    assert set(r["curves"]) == {"QPSK/1rx", "QPSK/2rx"}
    for c in r["curves"].values():
        assert len(c["ber"]) == 2
        assert c["ber"][1] <= c["ber"][0]  # BER falls with SNR
    import os
    assert os.path.exists(plot)
