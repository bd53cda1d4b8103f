"""Pallas kernel parity (interpret mode on CPU; compiled path runs on TPU
via OFDM_LTE_TPU_PALLAS=1 in bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_lte_tpu import cplx
from ofdm_lte_tpu.cplx import C
from ofdm_lte_tpu.ops import pallas_kernels as pk


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
