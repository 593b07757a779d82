"""End-to-end tests of the reference-compatible GaussianProcess wrapper API
(SURVEY.md section 2.1 component inventory, GP core row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptools_tpu import (
    DiagonalNoiseKernel,
    GaussianProcess,
    SquaredExponentialKernel,
)
from gptools_tpu.utils.priors import LogNormalJointPrior


def _gp(rng, noise=False):
    k = SquaredExponentialKernel(
        hyperprior=LogNormalJointPrior([0.0, -0.7], [0.8, 0.8])
    )
    nk = DiagonalNoiseKernel(n=0) if noise else None
    gp = GaussianProcess(k, noise_k=nk)
    X = np.linspace(0, 3, 30)
    y = np.sin(2 * X) + 0.1 * rng.standard_normal(30)
    gp.add_data(X, y, err_y=0.1)
    return gp, X, y


def test_add_data_update_ll(rng):
    gp, X, y = _gp(rng)
    neg_lp = float(gp.update_hyperparameters(jnp.array([1.0, 0.5])))
    assert np.isfinite(neg_lp)
    state = gp.compute_K_L_alpha_ll()
    assert np.isfinite(float(state.ll))
    # ll property caches
    assert float(gp.ll) == float(state.ll)


@pytest.mark.slow
def test_optimize_then_predict(rng, key):
    gp, X, y = _gp(rng)
    res = gp.optimize_hyperparameters(random_starts=4, key=key, num_steps=80)
    yhat, std = gp.predict(X)
    assert yhat.shape == (30,)
    # fit should interpolate to within a few noise sigmas
    assert float(jnp.max(jnp.abs(yhat - jnp.asarray(y)))) < 0.5
    # derivative prediction ~ 2cos(2x) at interior points
    d, dstd = gp.predict(np.array([1.5]), n=1)
    assert abs(float(d[0]) - 2 * np.cos(3.0)) < 0.6
    # full covariance output
    m, cov = gp.predict(X[:5], return_cov=True)
    assert cov.shape == (5, 5)
    w = np.linalg.eigvalsh(np.asarray(cov))
    assert w.min() > -1e-6


@pytest.mark.slow
def test_output_transform_prediction(rng, key):
    gp, X, y = _gp(rng)
    gp.optimize_hyperparameters(random_starts=2, key=key, num_steps=60)
    Xs = np.linspace(0.5, 2.5, 9)
    O = np.full((1, 9), 1.0 / 9)  # average of f over the grid
    m_t, std_t = gp.predict(Xs, output_transform=O)
    m_plain, _ = gp.predict(Xs)
    assert np.isclose(float(m_t[0]), float(np.mean(np.asarray(m_plain))), atol=1e-8)


@pytest.mark.slow
def test_sample_posterior_and_predict_mcmc(rng, key):
    gp, X, y = _gp(rng)
    res = gp.sample_hyperparameter_posterior(
        nsamp=150, burn=150, num_chains=4, sampler="nuts", key=key
    )
    assert res.thetas.shape == (4, 150, 2)
    means, stds = gp.compute_from_MCMC(X[:4], thin=50)
    assert means.shape[1] == 4
    m, s = gp.predict_MCMC(X[:4], thin=50)
    assert m.shape == (4,) and s.shape == (4,)
    m2, cov2 = gp.predict_MCMC(X[:4], thin=50, return_cov=True)
    assert cov2.shape == (4, 4)


def test_draw_sample_shapes(rng, key):
    gp, X, y = _gp(rng)
    gp.update_hyperparameters(jnp.array([1.0, 0.5]))
    draws = gp.draw_sample(np.linspace(0, 3, 12), num_samp=7, key=key)
    assert draws.shape == (12, 7)
    draws_eig = gp.draw_sample(
        np.linspace(0, 3, 12), num_samp=7, key=key, method="eig", num_eig=5
    )
    assert draws_eig.shape == (12, 7)


def test_remove_outliers(rng):
    gp, X, y = _gp(rng)
    # poison two points
    y_bad = y.copy()
    y_bad[5] += 5.0
    y_bad[20] -= 4.0
    gp2 = GaussianProcess(
        SquaredExponentialKernel(
            hyperprior=LogNormalJointPrior([0.0, -0.7], [0.8, 0.8])
        )
    )
    gp2.add_data(X, y_bad, err_y=0.1)
    gp2.update_hyperparameters(jnp.array([1.0, 0.5]))
    n_removed = gp2.remove_outliers(thresh=3.0)
    assert n_removed >= 2
    assert gp2.data.num_obs == 30 - n_removed


@pytest.mark.slow
def test_compute_ll_matrix(rng):
    gp, X, y = _gp(rng)
    grid, axes = gp.compute_ll_matrix([(0.5, 2.0), (0.2, 1.0)], 6)
    assert grid.shape == (6, 6)
    assert np.isfinite(np.asarray(grid)).all()


@pytest.mark.slow
def test_noise_kernel_hyperparam_inferred(rng, key):
    gp, X, y = _gp(rng, noise=True)
    assert gp.model.num_params == 3
    res = gp.optimize_hyperparameters(random_starts=3, key=key, num_steps=80)
    sn = float(res.theta[2])
    assert 0.0 <= sn < 1.0  # should find noise near the true 0.1 scale


@pytest.mark.slow
def test_frozen_predictors_match_live(rng, key):
    gp, X, y = _gp(rng)
    gp.update_hyperparameters(jnp.array([1.0, 0.5]))
    fp = gp.freeze_predictor()
    m_live, s_live = gp.predict(X[:7])
    m_froz, s_froz = fp(X[:7])
    np.testing.assert_allclose(np.asarray(m_froz), np.asarray(m_live), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(s_froz), np.asarray(s_live), rtol=1e-8)
    # derivative queries + ragged sizes through the bucket pad
    d1 = fp(np.array([1.0, 2.0, 2.5]), n=1)[0]
    assert d1.shape == (3,)

    gp.sample_hyperparameter_posterior(nsamp=100, burn=100, num_chains=4, key=key)
    fmc = gp.freeze_mcmc_predictor(max_samples=64)
    m1, s1 = fmc(X[:5])
    m2, s2 = gp.predict_MCMC(X[:5], thetas=np.asarray(fmc.thetas))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_default_bounds_map_escapes_plateau(rng, key):
    """Multi-start MAP with the DEFAULT uninformative kernel (uniform bounds
    (1e-4, 1e4)) must recover structure, not the data mean.

    Regression: linear-uniform prior draws put essentially every start on
    the flat huge-lengthscale plateau (P ~ 0.995 per start), so all starts
    converged to the same degenerate mode (lengthscale ~5e3, constant-mean
    prediction). `infer.map_fit.optimize` now re-spreads half the starts
    log-uniformly across bounds spanning >= 2 decades.
    """
    gp = GaussianProcess(SquaredExponentialKernel())  # default wide bounds
    X = np.linspace(0, 1, 12)
    y = np.sin(2 * np.pi * X) + 0.05 * rng.standard_normal(12)
    gp.add_data(X, y, err_y=0.05)
    gp.optimize_hyperparameters(random_starts=8, key=key, num_steps=80)
    xs = np.array([0.25, 0.75])
    yhat, _ = gp.predict(xs)
    # the degenerate mode predicts ~mean(y)~0 everywhere; the real fit
    # tracks the sine (+1/-1 at the probe points)
    assert float(yhat[0]) > 0.5 and float(yhat[1]) < -0.5
    # and the fitted lengthscale is physical, not the plateau
    assert float(gp.params[1]) < 10.0


def test_reference_attribute_views(rng):
    gp, X, y = _gp(rng)
    gp.update_hyperparameters(jnp.array([1.0, 0.5]))
    assert gp.num_dim == 1
    assert gp.X.shape == (30, 1)
    assert gp.y.shape == (30,) and gp.err_y.shape == (30,)
    assert gp.n.shape == (30, 1) and (gp.n == 0).all()
    assert gp.T is None
    assert gp.K.shape == (30, 30)
    assert gp.L.shape == (30, 30) and gp.alpha.shape == (30,)
    np.testing.assert_allclose(np.asarray(gp.params), [1.0, 0.5])
    gp.free_params = jnp.array([1.2, 0.6])
    np.testing.assert_allclose(np.asarray(gp.theta), [1.2, 0.6])
    assert gp.param_names == ("k.sigma_f", "k.l_1")
    assert gp.hyperprior.dim == 2


def test_draw_sample_modify_sign_and_unique_rows(rng, key):
    from gptools_tpu.utils import unique_rows

    gp, X, y = _gp(rng)
    gp.update_hyperparameters(jnp.array([1.0, 0.5]))
    d = gp.model.draw_sample(
        key, gp.theta, gp.data, X[:8], num_samp=3, method="eig",
        modify_sign=True, state=gp.compute_K_L_alpha_ll(),
    )
    assert d.shape == (8, 3) and np.isfinite(np.asarray(d)).all()

    a = np.array([[1, 2], [3, 4], [1, 2], [5, 6]])
    u = unique_rows(a)
    np.testing.assert_array_equal(u, [[1, 2], [3, 4], [5, 6]])


@pytest.mark.slow
def test_sampler_reference_spellings(rng):
    """Reference kwargs: nwalkers -> num_chains, thin subsamples, num_proc
    ignored (``gptools/core.py :: sample_hyperparameter_posterior``)."""
    gp, _, _ = _gp(rng)
    res = gp.sample_hyperparameter_posterior(
        nsamp=40, burn=40, sampler="hmc", nwalkers=4, thin=4, num_proc=8,
        num_steps=8,
    )
    assert res.u.shape == (4, 10, 2)
    assert res.thetas.shape == (4, 10, 2)
    assert res.log_prob.shape == (4, 10)
