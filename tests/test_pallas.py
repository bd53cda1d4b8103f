"""Pallas kernel parity (interpret mode on CPU; compiled path runs on TPU
via OFDM_LTE_TPU_PALLAS=1 in bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_lte_tpu import cplx
from ofdm_lte_tpu.cplx import C
from ofdm_lte_tpu.ops import pallas_kernels as pk


def test_matmul_gauss_matches_4mult(rng):
    """3-multiply Gauss form vs the 4-multiply expansion (cplx.matmul)."""
    a = C(jnp.asarray(rng.standard_normal((128, 300)), jnp.float32),
          jnp.asarray(rng.standard_normal((128, 300)), jnp.float32))
    b = C(jnp.asarray(rng.standard_normal((300, 96)), jnp.float32),
          jnp.asarray(rng.standard_normal((300, 96)), jnp.float32))
    ref = cplx.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    out = cplx.matmul_gauss(a, b, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                               rtol=1e-5, atol=1e-3)


def test_modem_cmatmul_backend_gauss(rng, monkeypatch):
    """End-to-end modem parity with OFDM_LTE_TPU_CMATMUL=gauss."""
    from ofdm_lte_tpu import LTEConfig
    from ofdm_lte_tpu.ops import ofdm

    cfg = LTEConfig(bandwidth=1.25, modulation="QPSK")
    from ofdm_lte_tpu.grid import grid_for
    nd = grid_for(cfg).num_data
    data = C(jnp.asarray(rng.standard_normal((4, 3, nd)), jnp.float32),
             jnp.asarray(rng.standard_normal((4, 3, nd)), jnp.float32))
    ref = ofdm.modulate_symbols(data, cfg)
    monkeypatch.setenv("OFDM_LTE_TPU_CMATMUL", "gauss")
    out = ofdm.modulate_symbols(data, cfg)
    np.testing.assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(not pk.HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("gauss", [False, True])
def test_cmatmul_pallas_gauss_matches_xla(gauss, rng):
    M, K, N = 128, 512, 260
    a = C(jnp.asarray(rng.standard_normal((M, K)), jnp.float32),
          jnp.asarray(rng.standard_normal((M, K)), jnp.float32))
    b = C(jnp.asarray(rng.standard_normal((K, N)), jnp.float32),
          jnp.asarray(rng.standard_normal((K, N)), jnp.float32))
    ref = cplx.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    out = pk.cmatmul_pallas_2d(a, b, interpret=True, gauss=gauss)
    np.testing.assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.skipif(not pk.HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("M,K,N", [(64, 128, 96), (300, 512, 260)])
def test_cmatmul_pallas_matches_xla(M, K, N, rng):
    a = C(jnp.asarray(rng.standard_normal((M, K)), jnp.float32),
          jnp.asarray(rng.standard_normal((M, K)), jnp.float32))
    b = C(jnp.asarray(rng.standard_normal((K, N)), jnp.float32),
          jnp.asarray(rng.standard_normal((K, N)), jnp.float32))
    ref = cplx.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    out = pk.cmatmul_pallas_2d(a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                               rtol=1e-5, atol=1e-4)
