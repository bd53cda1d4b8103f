"""CLI smoke tests — the headless GUI-replacement workflows (cli.py).

Each reference GUI action has a CLI equivalent (SURVEY §2.7); these drive
them in-process (cli.main(argv)) on tiny 1.25 MHz configs so every command
stays wired end-to-end: info, run (+constellation PNG), sweep
(+checkpoint resume +plot), fullsweep, image round-trip, papr CCDF.
"""
import json
import os

import numpy as np
import pytest

from ofdm_lte_tpu import cli


def _run(capsys, argv):
    cli.main(argv)
    return capsys.readouterr().out


def test_cli_info(capsys):
    out = _run(capsys, ["info", "--bandwidth", "1.25"])
    assert "FFT Size" in out or "FFT" in out
    assert "Data Subcarriers" in out


def test_cli_run_siso_with_constellation(capsys, tmp_path):
    png = str(tmp_path / "const.png")
    out = _run(capsys, ["run", "--bandwidth", "1.25", "--snr", "30",
                        "--num-bits", "2000", "--constellation", png])
    r = json.loads(out)
    assert r["ber"] < 0.01
    assert os.path.getsize(png) > 0


def test_cli_run_spatial(capsys):
    out = _run(capsys, ["run", "--bandwidth", "1.25", "--pipeline",
                        "spatial", "--num-tx", "2", "--num-rx", "2",
                        "--rank", "2", "--snr", "25",
                        "--num-bits", "2000"])
    r = json.loads(out)
    assert r["ber"] < 0.2


def test_cli_sweep_checkpoint_resume(capsys, tmp_path):
    ckpt = str(tmp_path / "state.json")
    png = str(tmp_path / "ber.png")
    argv = ["sweep", "--bandwidth", "1.25", "--snr-min", "4",
            "--snr-max", "8", "--snr-step", "4", "--frames", "1",
            "--num-symbols", "14", "--checkpoint", ckpt, "--plot", png]
    out1 = json.loads(_run(capsys, argv))
    state1 = json.load(open(ckpt))
    out2 = json.loads(_run(capsys, argv))      # resume accumulates
    state2 = json.load(open(ckpt))
    assert out1["snr_db"] == [4.0, 8.0]
    tot1 = np.array(state1["total"], dtype=float)
    tot2 = np.array(state2["total"], dtype=float)
    assert np.all(tot2 == 2 * tot1)
    assert state2["rounds"] == 2
    assert all(b >= 0 for b in out2["ber"])
    assert os.path.getsize(png) > 0
    # CI machinery (round 5): 2 banked rounds -> t-dist band in the JSON
    assert out2["ci_method"] == "t-dist over rounds"
    assert len(out2["ber_ci95"]) == 2
    assert out1["ci_method"] == "binomial"   # single round


def test_cli_bf_sweep_overlay(capsys, tmp_path):
    """The Beamforming GUI's beamforming-vs-SFBC sweep overlay
    (Beamforming/gui/main_window.py:243-246) renders as one PNG."""
    png = tmp_path / "bf_overlay.png"
    _run(capsys, ["bfcompare", "--bandwidth", "1.25",
                  "--modulation", "QPSK", "--num-bits", "4000",
                  "--lanes", "2", "--snr-min", "10", "--snr-max", "20",
                  "--snr-step", "10", "--sweep-frames", "1",
                  "--sweep-plot", str(png)])
    assert os.path.getsize(png) > 0


def test_cli_fullsweep(capsys):
    out = _run(capsys, ["fullsweep", "--bandwidth", "1.25",
                        "--modulations", "QPSK", "--rx-list", "1,2",
                        "--snr-min", "6", "--snr-max", "10",
                        "--snr-step", "4", "--iterations", "1",
                        "--num-symbols", "14"])
    r = json.loads(out)
    cells = r["results"] if "results" in r else r
    text = json.dumps(cells)
    assert "QPSK" in text
    assert "ber" in text


def test_cli_image_roundtrip(capsys, tmp_path):
    from PIL import Image
    src = str(tmp_path / "in.png")
    cmp_png = str(tmp_path / "cmp.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                    ).save(src)
    out = _run(capsys, ["image", "--bandwidth", "1.25", "--snr", "30",
                        "--input", src, "--output", cmp_png])
    r = json.loads(out)
    assert r["ber"] < 0.01
    assert r["psnr_db"] > 30
    assert os.path.getsize(cmp_png) > 0


def test_cli_papr(capsys, tmp_path):
    png = str(tmp_path / "ccdf.png")
    out = _run(capsys, ["papr", "--bandwidth", "1.25",
                        "--num-symbols", "40", "--plot", png])
    r = json.loads(out)
    # SC-FDM must show lower PAPR than plain OFDM (README.md:938-945)
    assert r["QPSK/SC-FDM"]["mean_db"] < r["QPSK/OFDM"]["mean_db"]
    assert os.path.getsize(png) > 0


# slow lane: the published-table assertion itself runs in
# test_spatial.TestBeamformingComparisonGrid (also slow); cheap bf coverage
# stays via test_spatial beamforming units
@pytest.mark.slow
def test_cli_bfcompare(capsys, tmp_path):
    """Beamforming-vs-SFBC comparison grid (published-table workflow of the
    Beamforming GUI, results/beamforming/resultados_comparacion.txt)."""
    table = tmp_path / "bfc.txt"
    out = _run(capsys, ["bfcompare", "--num-bits", "12000", "--lanes", "4",
                        "--output", str(table)])
    data = json.loads(out[:out.rindex("}") + 1])
    rows = data["rows"]
    assert len(rows) == 12                 # 3 RX x (1 SFBC + 3 BF)
    bf_rows = [r for r in rows if r["kind"] == "bf"]
    assert all("published_ber" in r for r in bf_rows)
    assert all("gain_db" in r for r in bf_rows)
    txt = table.read_text()
    assert "8x4 Beamforming" in txt and "Array Gain" in txt


# slow lane: harq sweep machinery is guarded by
# test_coded.TestHarqBatched::test_sharded_harq_sweep in the default run
@pytest.mark.slow
def test_cli_sweep_harq_and_detector(capsys, tmp_path):
    """The round-3 sweep surfaces: --pipeline harq (BLER/avg-transmissions
    output + checkpoint accumulation) and --detector/--rank on the spatial
    pipeline."""
    ckpt = str(tmp_path / "harq.json")
    argv = ["sweep", "--bandwidth", "5.0", "--modulation", "QPSK",
            "--pipeline", "harq", "--snr-min", "0", "--snr-max", "30",
            "--snr-step", "30", "--frames", "1", "--tb-bits", "504",
            "--rv-sequence", "0,1", "--checkpoint", ckpt]
    out1 = json.loads(_run(capsys, argv))
    assert out1["snr_db"] == [0.0, 30.0]
    assert out1["rv_sequence"] == [0, 1]
    assert len(out1["bler_per_stage"][0]) == 2
    assert out1["bler"][1] == 0.0 and out1["avg_transmissions"][1] == 1.0
    assert out1["bler_per_stage"][0][1] <= out1["bler_per_stage"][0][0]
    out2 = json.loads(_run(capsys, argv))          # checkpoint accumulates
    assert out2["tbs_per_point"] == 2 * out1["tbs_per_point"]

    out = json.loads(_run(capsys, [
        "sweep", "--bandwidth", "1.25", "--modulation", "QPSK",
        "--pipeline", "spatial", "--detector", "SIC", "--rank", "2",
        "--snr-min", "30", "--snr-max", "30", "--snr-step", "1",
        "--frames", "1", "--num-symbols", "14"]))
    assert out["ber"] == [0.0]
