"""Beamforming and TM4 spatial-multiplexing end-to-end pipelines."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.sim import beamforming as bfs
from ofdm_lte_tpu.sim import spatial


def _bits(cfg, n_sym, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2,
                        bfs.bits_per_frame(cfg, n_sym)).astype(np.int32)


def test_beamforming_high_snr_zero_ber():
    cfg = LTEConfig(bandwidth=5.0, modulation="64-QAM")
    bits = _bits(cfg, 14)
    r = bfs.simulate_beamforming(jax.random.PRNGKey(0), jnp.asarray(bits),
                                 60.0, cfg, num_tx=2, num_rx=1)
    assert float(r.ber) == 0.0


@pytest.mark.parametrize("num_tx", [2, 4, 8])
def test_beamforming_array_gain_grows(num_tx):
    """MRT array gain ≈ 10·log10(num_tx) dB on average
    (resultados_comparacion.txt: 3.01/6.02/9.03 dB for 2/4/8 TX)."""
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    gains = []
    for s in range(12):
        bits = _bits(cfg, 1, seed=s)
        r = bfs.simulate_beamforming(jax.random.PRNGKey(s),
                                     jnp.asarray(bits), 15.0, cfg,
                                     num_tx=num_tx, num_rx=1)
        gains.append(float(r.beamforming_gain_db))
    mean_gain = np.mean(gains)
    expected = 10 * np.log10(num_tx)
    assert abs(mean_gain - expected) < 1.8, (mean_gain, expected)


def test_beamforming_beats_low_snr_without_it():
    """At moderate SNR, 8-TX beamforming has far fewer errors than 2-TX
    (reference table: BER 3.4e-2 @2x1 vs 1.2e-4 @8x1, SNR 15 dB 64-QAM)."""
    cfg = LTEConfig(bandwidth=5.0, modulation="64-QAM")
    errs = {}
    for num_tx in (2, 8):
        e = t = 0
        for s in range(6):
            bits = _bits(cfg, 14, seed=s)
            r = bfs.simulate_beamforming(jax.random.PRNGKey(s),
                                         jnp.asarray(bits), 15.0, cfg,
                                         num_tx=num_tx, num_rx=1)
            e += int(r.bit_errors)
            t += len(bits)
        errs[num_tx] = e / t
    assert errs[8] < errs[2] / 5, errs


def test_beamforming_codebook_mode_runs():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    bits = _bits(cfg, 14)
    r = bfs.simulate_beamforming(jax.random.PRNGKey(0), jnp.asarray(bits),
                                 10.0, cfg, num_tx=4, num_rx=2,
                                 codebook_type="TM6", update_mode="static")
    assert 0.0 <= float(r.ber) < 0.5
    assert 0 <= int(r.pmi) < 16


@pytest.mark.parametrize("det", ["MMSE", "ZF", "SIC"])
def test_spatial_2x2_high_snr(det):
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    bits = _bits(cfg, 14)
    r = spatial.simulate_spatial_multiplexing(
        jax.random.PRNGKey(0), jnp.asarray(bits), 45.0, cfg,
        num_tx=2, num_rx=2, rank=2, detector_type=det)
    assert float(r.ber) < 0.01, (det, float(r.ber))


def test_spatial_rank1_mrc():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    bits = _bits(cfg, 14)
    r = spatial.simulate_spatial_multiplexing(
        jax.random.PRNGKey(0), jnp.asarray(bits), 40.0, cfg,
        num_tx=2, num_rx=2, rank=1, detector_type="MRC")
    assert float(r.ber) < 0.01


def test_spatial_adaptive_rank_runs():
    cfg = LTEConfig(bandwidth=5.0, modulation="64-QAM")
    bits = _bits(cfg, 14)
    r = spatial.simulate_spatial_multiplexing(
        jax.random.PRNGKey(1), jnp.asarray(bits), 25.0, cfg,
        num_tx=4, num_rx=2, rank="adaptive", detector_type="MMSE")
    assert 0.0 <= float(r.ber) < 0.6


def test_spatial_4x4_rank4():
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    bits = _bits(cfg, 14)
    r = spatial.simulate_spatial_multiplexing(
        jax.random.PRNGKey(2), jnp.asarray(bits), 45.0, cfg,
        num_tx=4, num_rx=4, rank=4, detector_type="MMSE")
    assert float(r.ber) < 0.05, float(r.ber)


def test_batched_lanes_per_lane_snr():
    """Monte-Carlo leading axes + per-lane SNR through spatial/beamforming
    (regression: σ² alignment against appended matrix axes)."""
    import jax.numpy as jnp
    cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
    lanes = 3
    bits = np.random.default_rng(0).integers(
        0, 2, (lanes, spatial.bits_per_frame(cfg, 14))).astype(np.int32)
    snrs = jnp.asarray([0.0, 15.0, 60.0])
    for det in ("MMSE", "SIC"):
        r = spatial.simulate_spatial_multiplexing(
            jax.random.PRNGKey(0), jnp.asarray(bits), snrs, cfg,
            num_tx=2, num_rx=2, rank=2, detector_type=det)
        b = np.asarray(r.ber)
        assert b.shape == (lanes,) and b[0] > b[2]
    rb = bfs.simulate_beamforming(jax.random.PRNGKey(0), jnp.asarray(bits),
                                  snrs, cfg, num_tx=4, num_rx=2)
    b = np.asarray(rb.ber)
    assert b.shape == (lanes,) and b[0] > b[2] == 0.0


def test_bin_channel_matches_time_path():
    """The bin-domain flat spatial channel (PARITY.md divergence 7) is an
    algebraic identity: same key => same BER as the time-domain path (CPU
    f32 DFTs are exact enough that even the hard decisions agree), and
    PAPR agrees to float tolerance."""
    import os
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    rng = np.random.default_rng(7)
    bits = jnp.asarray(rng.integers(
        0, 2, (3, spatial.bits_per_frame(cfg, 14))).astype(np.int32))
    snr = jnp.asarray([8.0, 15.0, 30.0], jnp.float32)
    key = jax.random.PRNGKey(11)
    r_bin = spatial.simulate_spatial_multiplexing(
        key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
        detector_type="MMSE")
    os.environ["OFDM_LTE_TPU_SPATIAL_CHANNEL"] = "time"
    jax.clear_caches()
    try:
        r_time = spatial.simulate_spatial_multiplexing(
            key, bits, snr, cfg, num_tx=2, num_rx=2, rank=2,
            detector_type="MMSE")
    finally:
        del os.environ["OFDM_LTE_TPU_SPATIAL_CHANNEL"]
        jax.clear_caches()
    # hard-decision agreement: identical draws, only fp reassociation +
    # the exact-vs-round-tripped DFT separate the two paths
    assert np.max(np.abs(np.asarray(r_bin.ber)
                         - np.asarray(r_time.ber))) < 2e-4
    np.testing.assert_allclose(np.asarray(r_bin.papr_db),
                               np.asarray(r_time.papr_db), atol=1e-4)


def test_grid_validation_artifact():
    """The committed spatial validation grid at the reference's published
    capstone shapes (2x2/4x2/4x4/8x4 x MMSE/SIC, 64-QAM @25 dB, 10 MHz
    rayleigh_mp — /root/reference/test/test_spatial_multiplexing.py:44-49)
    must exist, cover all 8 cells, and record the reference's frozen draw
    inside our Monte-Carlo spread in every cell. Regenerate with
    tools/spatial_grid_validation.py (runs BOTH implementations)."""
    import json, os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results",
        "spatial_grid_validation.json")
    with open(path) as f:
        art = json.load(f)
    assert art["all_pass"] is True
    cells = {(row["config"], row["detector"]) for row in art["grid"]}
    assert cells == {(c, d) for c in ("2x2", "4x2", "4x4", "8x4")
                     for d in ("MMSE", "SIC")}
    for row in art["grid"]:
        assert row["pass"] is True, row
        assert (row["ours_ber_min"] - row["grain"] <= row["ref_ber"]
                <= row["ours_ber_max"] + row["grain"]), row


def test_extended_layout_identical_below_8tx():
    """pilot_layout='extended' == 'reference' for num_tx <= 4 (same step,
    same combs)."""
    from ofdm_lte_tpu.grid import orthogonal_pilot_indices, pilot_step
    cfg = LTEConfig(bandwidth=5.0, modulation="QPSK")
    for ntx in (1, 2, 4):
        assert pilot_step(ntx, "extended") == pilot_step(ntx, "reference")
        ref = orthogonal_pilot_indices(cfg, ntx, "reference")
        ext = orthogonal_pilot_indices(cfg, ntx, "extended")
        for a, b in zip(ref, ext):
            np.testing.assert_array_equal(a, b)
    # 8 TX: reference combs collide pairwise, extended ones are disjoint
    ref8 = orthogonal_pilot_indices(cfg, 8, "reference")
    ext8 = orthogonal_pilot_indices(cfg, 8, "extended")
    np.testing.assert_array_equal(ref8[0], ref8[4])
    assert not np.intersect1d(ext8[0], ext8[4]).size


def test_8tx_extended_fixes_collision_flat():
    """8x4 rank-4 MMSE on the flat channel: the extended layout must reach
    a usable BER where the reference layout is degenerate (~0.4)."""
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    n = spatial.bits_per_frame(cfg, 4)
    bits = jnp.asarray(np.random.default_rng(2).integers(
        0, 2, (4, n)).astype(np.int32))
    ber = {}
    for layout in ("reference", "extended"):
        r = spatial.simulate_spatial_multiplexing(
            jax.random.PRNGKey(2), bits, 25.0, cfg, num_tx=8, num_rx=4,
            rank=4, detector_type="MMSE", pilot_layout=layout)
        ber[layout] = float(jnp.median(r.ber))
    assert ber["reference"] > 0.2, ber     # the preserved degeneracy
    assert ber["extended"] < 0.02, ber


def test_8tx_extended_artifact():
    """The committed capstone-shape measurement of the extended layout
    (tools/probe_8tx_extended.py) must show the divergence working:
    every extended row far below its reference-layout counterpart."""
    import json, os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results",
        "spatial_8tx_extended.json")
    with open(path) as f:
        art = json.load(f)
    by_key = {(r["layout"], r["detector"], r["rank"]): r
              for r in art["grid"]}
    assert len(by_key) == 12
    for det in ("MMSE", "SIC"):
        for rank in ("2", "4", "adaptive"):
            ref = by_key[("reference", det, rank)]["ber_median"]
            ext = by_key[("extended", det, rank)]["ber_median"]
            assert ref > 0.3, (det, rank, ref)   # degenerate as shipped
            assert ext < 0.5 * ref, (det, rank, ref, ext)
    # headline: rank-2 MMSE reaches a genuinely usable BER
    assert by_key[("extended", "MMSE", "2")]["ber_median"] < 0.01


def test_spatial_sic_beats_zf_at_moderate_snr():
    cfg = LTEConfig(bandwidth=5.0, modulation="16-QAM")
    e = {"ZF": 0, "SIC": 0}
    t = 0
    for s in range(4):
        bits = _bits(cfg, 14, seed=s)
        for det in ("ZF", "SIC"):
            r = spatial.simulate_spatial_multiplexing(
                jax.random.PRNGKey(s), jnp.asarray(bits), 18.0, cfg,
                num_tx=2, num_rx=2, rank=2, detector_type=det)
            e[det] += int(r.bit_errors)
        t += len(bits)
    assert e["SIC"] <= e["ZF"] * 1.1, e


class TestTimeVaryingBeamforming:
    """AdaptiveBeamforming cadence driven by a Jakes time-varying channel
    (reference intent: beamforming_precoder.py:202-293; its own sim holds H
    constant, so the cadence logic is only observable here)."""

    def test_stationary_statistics_match_flat(self):
        """Jakes-evolved H has unit-power CN-like marginals: mean realized
        MRT gain with per-symbol updates ≈ 10·log10(num_tx)."""
        from ofdm_lte_tpu.config import doppler_hz
        cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
        bits = np.random.default_rng(0).integers(
            0, 2, (16, bfs.bits_per_frame(cfg, 28))).astype(np.int32)
        r = bfs.simulate_beamforming_time_varying(
            jax.random.PRNGKey(0), jnp.asarray(bits), 15.0, cfg,
            num_tx=4, num_rx=1, update_period=1,
            doppler_hz=float(doppler_hz(120.0, 2.0)))
        mean_gain = float(jnp.mean(r.beamforming_gain_db))
        assert abs(mean_gain - 10 * np.log10(4)) < 1.0, mean_gain
        assert r.pmi_history.shape == (16, 28)

    def test_stale_precoder_degrades_and_cadence_recovers(self):
        """At Veh-B Doppler (120 km/h, f_D=222 Hz) a W computed once at t=0
        decorrelates from H(t): realized gain and BER degrade vs the
        0.1·Tc cadence (update every symbol at this speed,
        BEAMFORMING_IMPLEMENTATION_SUMMARY.md:175-179)."""
        from ofdm_lte_tpu.config import doppler_hz
        from ofdm_lte_tpu.mimo import beamforming as bfp
        cfg = LTEConfig(bandwidth=1.25, modulation="16-QAM")
        S = 140
        fd = float(doppler_hz(120.0, 2.0))
        assert bfp.update_period_symbols(120.0, 2.0) == 1
        bits = np.random.default_rng(1).integers(
            0, 2, (8, bfs.bits_per_frame(cfg, S))).astype(np.int32)
        kwargs = dict(num_tx=4, num_rx=1, doppler_hz=fd)
        r_stale = bfs.simulate_beamforming_time_varying(
            jax.random.PRNGKey(1), jnp.asarray(bits), 14.0, cfg,
            update_period=S, **kwargs)      # W only at t=0 (never refreshed)
        r_cad = bfs.simulate_beamforming_time_varying(
            jax.random.PRNGKey(1), jnp.asarray(bits), 14.0, cfg,
            update_period=1, **kwargs)      # proper cadence
        g_stale = float(jnp.mean(r_stale.beamforming_gain_db))
        g_cad = float(jnp.mean(r_cad.beamforming_gain_db))
        ber_stale = float(jnp.mean(r_stale.ber))
        ber_cad = float(jnp.mean(r_cad.ber))
        assert g_cad > g_stale + 2.0, (g_cad, g_stale)
        assert ber_cad < ber_stale, (ber_cad, ber_stale)
        # a stale MRT precoder on a decorrelated channel keeps no array
        # gain: its time-averaged realized gain collapses toward 0 dB
        assert g_stale < 2.5, g_stale

    def test_low_velocity_slow_cadence_is_enough(self):
        """At Ped-A 3 km/h (f_D 5.6 Hz, Tc = 9/(16π·f_D) ≈ 32 ms -> update
        every ~48 symbols) the channel barely moves between updates: the
        slow cadence loses <1 dB vs per-symbol updates."""
        from ofdm_lte_tpu.config import doppler_hz
        from ofdm_lte_tpu.mimo import beamforming as bfp
        cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
        S = 140
        period = bfp.update_period_symbols(3.0, 2.0)
        assert period == 48                  # 0.1·Tc / 66.7 µs
        fd = float(doppler_hz(3.0, 2.0))
        bits = np.random.default_rng(2).integers(
            0, 2, (8, bfs.bits_per_frame(cfg, S))).astype(np.int32)
        r_slow = bfs.simulate_beamforming_time_varying(
            jax.random.PRNGKey(2), jnp.asarray(bits), 12.0, cfg,
            num_tx=4, num_rx=1, update_period=period, doppler_hz=fd)
        r_fast = bfs.simulate_beamforming_time_varying(
            jax.random.PRNGKey(2), jnp.asarray(bits), 12.0, cfg,
            num_tx=4, num_rx=1, update_period=1, doppler_hz=fd)
        g_slow = float(jnp.mean(r_slow.beamforming_gain_db))
        g_fast = float(jnp.mean(r_fast.beamforming_gain_db))
        assert g_fast - g_slow < 1.0, (g_fast, g_slow)

    def test_codebook_mode_pmi_history_varies(self):
        """On a moving channel the per-symbol PMI history contains multiple
        distinct PMIs, and pmi_statistics aggregates it (the reference's
        csi_feedback.py:192-228 over a real history, not a constant)."""
        from ofdm_lte_tpu.config import doppler_hz
        from ofdm_lte_tpu.mimo import csi
        cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
        bits = np.random.default_rng(3).integers(
            0, 2, bfs.bits_per_frame(cfg, 140)).astype(np.int32)
        r = bfs.simulate_beamforming_time_varying(
            jax.random.PRNGKey(3), jnp.asarray(bits), 10.0, cfg,
            num_tx=2, num_rx=1, update_mode="codebook", update_period=1,
            doppler_hz=float(doppler_hz(120.0, 2.0)))
        hist = np.asarray(r.pmi_history)
        assert hist.shape == (140,)
        stats = csi.pmi_statistics(hist, 2, "TM6")
        assert stats["unique_pmis"] >= 2
        assert stats["total_feedbacks"] == 140
        assert stats["pmi_distribution"].sum() == 140

    def test_api_jakes_channel_model(self):
        from ofdm_lte_tpu.api import OFDMSimulator
        sim = OFDMSimulator(LTEConfig(bandwidth=1.25, modulation="QPSK"))
        bits = np.random.default_rng(4).integers(0, 2, 5000)
        res = sim.simulate_beamforming(bits, snr_db=15.0, num_tx=2,
                                       num_rx=1, velocity_kmh=120.0,
                                       update_mode="codebook",
                                       channel_model="jakes")
        assert res["update_period_symbols"] == 1
        assert len(res["pmi_history"]) >= 2
        assert res["unique_pmis"] >= 1
        assert res["pmi_statistics"]["total_feedbacks"] == len(
            res["pmi_history"])

    def test_api_static_history_matches_reference_shape(self):
        """Static channel: per-symbol history of identical PMIs (the
        reference appends one PMI per OFDM symbol, ofdm_core.py:2366-2369)
        and unique_pmis == 1 — now computed, not hardcoded."""
        from ofdm_lte_tpu.api import OFDMSimulator
        cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
        sim = OFDMSimulator(cfg)
        bits = np.random.default_rng(5).integers(0, 2, 5000)
        res = sim.simulate_beamforming(bits, snr_db=15.0, num_tx=2,
                                       num_rx=1, update_mode="static")
        S = int(np.ceil(5000 / bfs.bits_per_frame(cfg, 1)))
        assert len(res["pmi_history"]) == S
        assert len(set(res["pmi_history"])) == 1
        assert res["unique_pmis"] == 1


class TestBeamformingComparisonGrid:
    """The published beamforming-vs-SFBC table reproduced end-to-end
    (results/beamforming/resultados_comparacion.txt; full-payload artifact:
    results/beamforming_comparison.txt via `cli bfcompare`)."""

    # slow lane: the same published table is spot-checked cheaply by
    # test_array_gain_means_match_published / test_sfbc_baseline below
    @pytest.mark.slow
    def test_published_rows_inside_mc_spread(self):
        """Each published beamforming BER (a single-H-realization sample,
        ofdm_core.py:2347-2349) must fall inside our simulated conditional-
        BER spread over independent channel realizations."""
        from ofdm_lte_tpu.cli import run_bf_comparison, \
            PUBLISHED_BF_COMPARISON
        cfg = LTEConfig(bandwidth=10.0, modulation="64-QAM")
        bits = np.random.default_rng(0).integers(0, 2, 60000).astype(
            np.int32)
        # 64 realizations: the published 4x1 row is a ~5% channel-power
        # tail event (BER worse than 2x1 despite 6 dB array gain), which a
        # dozen lanes miss ~40% of the time; fixed seed keeps this exact
        rows = run_bf_comparison(bits, 15.0, cfg, lanes=64, seed=0)
        checked = 0
        for row in rows:
            pub = PUBLISHED_BF_COMPARISON.get(
                (row["kind"], row["num_tx"], row["num_rx"]))
            if pub is None or row["kind"] != "bf":
                continue
            # pad the spread by one MC standard deviation of the published
            # point estimate (binomial, 1.62e6 bits) + our 60k-bit grain
            grain = max(3.0 / 60000,
                        3 * np.sqrt(pub["ber"] * (1 - pub["ber"]) / 60000))
            assert row["ber_min"] - grain <= pub["ber"] \
                <= row["ber_max"] + grain, (row["name"], pub, row["ber_min"],
                                            row["ber_max"])
            checked += 1
        assert checked == 9                   # {2,4,8}TX x {1,2,4}RX

    def test_array_gain_means_match_published(self):
        """Mean MRT array gain over realizations ≈ 10·log10(num_tx) for
        num_rx=1 — the published 3.01 / 6.02 / 9.03 dB rows."""
        from ofdm_lte_tpu.cli import run_bf_comparison
        cfg = LTEConfig(bandwidth=10.0, modulation="64-QAM")
        bits = np.random.default_rng(1).integers(0, 2, 12000).astype(
            np.int32)
        rows = run_bf_comparison(bits, 15.0, cfg, lanes=24, rx_list=(1,),
                                 seed=1)
        for row in rows:
            if row["kind"] != "bf":
                continue
            expected = 10 * np.log10(row["num_tx"])
            assert abs(row["gain_db"] - expected) < 1.2, (row["name"],
                                                          row["gain_db"])

    def test_sfbc_baseline_same_order_as_published(self):
        """The published SFBC 2x1 row (6.2885e-2) came from a code state
        whose MISO path no longer runs (it crashes as-shipped, PARITY.md
        divergence 1); our intended-behavior implementation must land in
        the same order of magnitude on the same deterministic channel."""
        from ofdm_lte_tpu.cli import run_bf_comparison
        cfg = LTEConfig(bandwidth=10.0, modulation="64-QAM")
        bits = np.random.default_rng(2).integers(0, 2, 60000).astype(
            np.int32)
        rows = run_bf_comparison(bits, 15.0, cfg, lanes=2, rx_list=(1,),
                                 tx_list=(), seed=2)
        (row,) = rows
        assert row["kind"] == "sfbc"
        assert 0.02 < row["ber"] < 0.13, row["ber"]
