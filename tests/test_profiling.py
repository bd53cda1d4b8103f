"""Roofline accounting: cost models, measured-peaks loading, dual
fractions."""
import numpy as np

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.utils import profiling as pr


def test_peaks_loaded_from_artifact():
    """results/machine_peaks.json is committed, so the module must load
    the measured ceilings (and they must be physically sane)."""
    assert pr.PEAKS_SOURCE.startswith("measured")
    assert 10e12 < pr.PEAK_BF16_FLOPS < 300e12
    assert 100e9 < pr.PEAK_HBM_BYTES_S < 2000e9
    assert 50e9 < pr.PEAK_VPU_FLOPS < 10e12


def test_reports_carry_dual_fractions():
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    r = pr.roofline_report(cfg, 14, 256, 1.4e-3, precision="default",
                           dispatch_floor_s=1.3e-3)
    assert 0 < r["roofline_fraction"]
    assert 0 < r["roofline_fraction_datasheet_peaks"]
    # steady-state accounting: the TX side and (freq-AWGN) RX DFTs are
    # loop-invariant under the fixed-codeword harness and excluded from
    # the per-step fraction; the full chain stays reported separately
    assert {"tx_idft", "qam_map", "papr", "awgn_sigma", "rx_dft_data",
            "rx_dft_pilot"} <= set(r["hoisted_stages"])
    assert r["full_chain_roofline_s"] > r["roofline_s"] - 1.3e-3
    assert r["full_chain_model_over_measured_x"] > r["roofline_fraction"]
    rs = pr.spatial_roofline_report(cfg, 14, 1024, 15e-3,
                                    dispatch_floor_s=1.4e-3)
    assert 0 < rs["roofline_fraction_excl_floor"]
    assert rs["hoisted_stages"] == ["papr_corr", "qam_map_precode",
                                    "tx_idft"]
    assert set(rs["per_kernel_us"]) == {
        "qam_map_precode", "tx_idft", "papr_corr", "channel_bins",
        "estimate_per_tx", "detect_mmse2", "demap_count"}


def test_fir_report_names_the_channel_fir_family():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    costs = pr.simo_frame_cost(cfg, 14, 256, num_rx=4)
    r = pr.fir_roofline_report(costs, 5.6e-3, dispatch_floor_s=1.4e-3)
    assert r["channel_fir_roofline_s"] > 0
    assert {"jakes_matmul", "tap_fma"} <= set(r["per_kernel_us"])
    # the FIR family dominates the modeled channel cost for this workload
    fir = r["per_kernel_us"]["jakes_matmul"] + r["per_kernel_us"]["tap_fma"]
    assert fir > 0.3 * sum(r["per_kernel_us"].values())


def test_spatial_time_impl_models_rx_dfts():
    cfg = LTEConfig(bandwidth=20.0, modulation="64-QAM")
    c_bins = pr.spatial_frame_cost(cfg, 14, 256, channel_impl="bins")
    c_time = pr.spatial_frame_cost(cfg, 14, 256, channel_impl="time")
    assert "rx_dft" in c_time and "rx_dft" not in c_bins
    t_bins = sum(c.roofline_time_s() for c in c_bins.values())
    t_time = sum(c.roofline_time_s() for c in c_time.values())
    assert t_time > t_bins   # the bin identity removes modeled work
