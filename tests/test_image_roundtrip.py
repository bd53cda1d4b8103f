"""Image round-trip integration tests — the reference's dominant test
pattern (SURVEY §4.2: test_siso_image.py, test_simo_image.py, ...), with
asserts instead of prints."""
import numpy as np
import pytest

from ofdm_lte_tpu import LTEConfig
from ofdm_lte_tpu.api import OFDMSimulator
from ofdm_lte_tpu.utils import image as img_utils


@pytest.fixture(scope="module")
def test_image(tmp_path_factory):
    rng = np.random.default_rng(42)
    # structured synthetic image (gradients + blocks) so PSNR is meaningful
    x = np.linspace(0, 255, 48)
    img = np.zeros((48, 48, 3), np.uint8)
    img[..., 0] = x[None, :].astype(np.uint8)
    img[..., 1] = x[:, None].astype(np.uint8)
    img[..., 2] = rng.integers(0, 256, (48, 48))
    return img


def _roundtrip(sim_method, img, snr, **kw):
    bits, meta = img_utils.image_to_bits(img)
    r = sim_method(bits.astype(np.int32), snr, **kw)
    rec = img_utils.bits_to_image(r["bits_received_array"], meta)
    return r, rec


def test_siso_image_high_snr(test_image):
    sim = OFDMSimulator(LTEConfig(bandwidth=5.0, modulation="16-QAM"))
    r, rec = _roundtrip(sim.simulate_siso, test_image, 40.0)
    assert r["ber"] == 0.0
    np.testing.assert_array_equal(rec, test_image)


def test_siso_image_noisy_psnr(test_image):
    """Moderate SNR: errors occur but the image stays recognizable
    (PSNR tracks BER, cf. results/beamforming tables)."""
    sim = OFDMSimulator(LTEConfig(bandwidth=5.0, modulation="64-QAM"))
    r, rec = _roundtrip(sim.simulate_siso, test_image, 17.0)
    assert 0.0 < r["ber"] < 0.1
    p = img_utils.psnr(test_image, rec)
    assert 10.0 < p < 60.0
    assert img_utils.ssim(test_image, rec) > 0.3


def test_simo_image_rayleigh(test_image):
    sim = OFDMSimulator(LTEConfig(bandwidth=5.0, modulation="QPSK"),
                        channel_type="rayleigh_mp",
                        itu_profile="Pedestrian_A", velocity_kmh=3.0)
    r, rec = _roundtrip(sim.simulate_simo, test_image, 15.0, num_rx=4)
    assert r["ber"] < 0.01
    assert img_utils.psnr(test_image, rec) > 25.0


def test_mimo_sfbc_image(test_image):
    sim = OFDMSimulator(LTEConfig(bandwidth=5.0, modulation="QPSK"))
    r, rec = _roundtrip(sim.simulate_mimo, test_image, 14.0, num_rx=2)
    assert r["ber"] < 0.05


def test_coded_image_clean_at_waterfall(test_image):
    """Turbo-coded image at moderate SNR reconstructs exactly
    (test_coded_image_comparison.py pattern)."""
    sim = OFDMSimulator(LTEConfig(bandwidth=5.0, modulation="QPSK"))
    bits, meta = img_utils.image_to_bits(test_image)
    r = sim.simulate_siso_coded(bits, 6.0)
    rec = img_utils.bits_to_image(r["bits_received_array"], meta)
    assert r["crc_pass"]
    np.testing.assert_array_equal(rec, test_image)


def test_comparison_png_saved(test_image, tmp_path):
    out = tmp_path / "cmp.png"
    img_utils.save_comparison(test_image, test_image, str(out), "test")
    assert out.exists() and out.stat().st_size > 1000
