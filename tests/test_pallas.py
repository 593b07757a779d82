"""Pallas covariance builders vs the generic autodiff/XLA assembly path
(interpret mode on CPU; the same code compiles for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptools_tpu.models.dataset import DatasetBuilder
from gptools_tpu.ops import assemble
from gptools_tpu.ops.kernels import GibbsKernel1dTanh, SquaredExponentialKernel
from gptools_tpu.ops.pallas_cov import (
    cov_matrix_flagship,
    gibbs_tanh_cov,
    pallas_supported,
    se_cov,
)


def _data(rng, with_derivs=True):
    b = DatasetBuilder(1)
    X = np.sort(rng.uniform(0, 1.2, 20))
    b.add(X, np.zeros(20), err_y=0.05)
    if with_derivs:
        b.add(np.array([0.0, 1.2]), np.zeros(2), err_y=0.01, n=1)
    return b.build(dtype=jnp.float32)


@pytest.mark.parametrize("with_derivs", [False, True])
def test_se_pallas_matches_xla(rng, with_derivs):
    data = _data(rng, with_derivs)
    k = SquaredExponentialKernel()
    theta = jnp.array([1.3, 0.4], jnp.float32)
    K_ref = assemble.cov_matrix(
        k, theta, data.Xf, data.nid, data.Xf, data.nid, data.multi_indices
    )
    K_pal = se_cov(data.Xf.reshape(-1), data.nid, theta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(K_pal), np.asarray(K_ref), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize("with_derivs", [False, True])
def test_gibbs_pallas_matches_autodiff(rng, with_derivs):
    data = _data(rng, with_derivs)
    k = GibbsKernel1dTanh()
    theta = jnp.array([1.5, 0.4, 0.08, 0.1, 0.9], jnp.float32)
    K_ref = assemble.cov_matrix(
        k, theta, data.Xf, data.nid, data.Xf, data.nid, data.multi_indices
    )
    K_pal = gibbs_tanh_cov(data.Xf.reshape(-1), data.nid, theta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(K_pal), np.asarray(K_ref), rtol=5e-5, atol=5e-6
    )


def test_gibbs_pallas_f64_high_precision(rng):
    """In f64 the hand-derived formulas must agree with autodiff to ~1e-12 —
    catches any algebra error the f32 tolerance could hide."""
    data = _data(rng, True).astype(jnp.float64)
    k = GibbsKernel1dTanh()
    theta = jnp.array([1.5, 0.4, 0.08, 0.1, 0.9], jnp.float64)
    K_ref = assemble.cov_matrix(
        k, theta, data.Xf, data.nid, data.Xf, data.nid, data.multi_indices
    )
    K_pal = gibbs_tanh_cov(data.Xf.reshape(-1), data.nid, theta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(K_pal), np.asarray(K_ref), rtol=1e-11, atol=1e-13
    )


def test_vmap_over_theta_batch(rng):
    data = _data(rng, True)
    thetas = jnp.asarray(
        np.abs(np.random.default_rng(1).uniform(0.05, 1.5, (4, 5))), jnp.float32
    )
    f = lambda t: gibbs_tanh_cov(data.Xf.reshape(-1), data.nid, t, interpret=True)
    Ks = jax.vmap(f)(thetas)
    assert Ks.shape == (4, data.num_latent, data.num_latent)
    K0 = f(thetas[0])
    np.testing.assert_allclose(np.asarray(Ks[0]), np.asarray(K0), rtol=1e-6)


def test_dispatch_predicates(rng):
    data = _data(rng, True)
    assert pallas_supported(SquaredExponentialKernel(), data)
    assert pallas_supported(GibbsKernel1dTanh(), data)
    from gptools_tpu.ops.kernels import Matern52Kernel

    assert not pallas_supported(Matern52Kernel(), data)
    K = cov_matrix_flagship(
        GibbsKernel1dTanh(),
        jnp.array([1.5, 0.4, 0.08, 0.1, 0.9], jnp.float32),
        data,
        interpret=True,
    )
    assert K.shape == (data.num_latent, data.num_latent)
