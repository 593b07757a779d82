"""Predictive-profile parity (BASELINE.json: 'posterior moments of
hyperparameters AND predictive profiles must match the reference pipeline'):
MCMC-marginalized predictive envelopes computed from our sampler's thetas vs
envelopes computed from ensemble-oracle thetas, through the same predictive
math — and the predictive math itself vs the numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptools_tpu.models.dataset import DatasetBuilder
from gptools_tpu.models.gp import GPModel
from gptools_tpu.ops.kernels import SquaredExponentialKernel
from gptools_tpu.utils.priors import LogNormalJointPrior
from gptools_tpu.infer import nuts, model_logp
from tests.oracle.ensemble import run_ensemble


def _problem(rng):
    X = np.linspace(0, 3, 18)
    y = np.sin(1.5 * X) + 0.1 * rng.standard_normal(len(X))
    b = DatasetBuilder(1)
    b.add(X, y, err_y=0.1)
    b.add(np.array([0.0]), np.array([1.5]), err_y=0.05, n=1)
    data = b.build()
    model = GPModel(
        SquaredExponentialKernel(
            hyperprior=LogNormalJointPrior([0.0, -0.5], [0.75, 0.75])
        )
    )
    return model, data


def _predictive_envelope(model, data, thetas, Xstar):
    def one(theta):
        pred = model.predict(theta, data, Xstar, return_std=True)
        return pred.mean, pred.std

    means, stds = jax.vmap(one)(jnp.asarray(thetas))
    mean = jnp.mean(means, axis=0)
    var = jnp.mean(stds**2 + means**2, axis=0) - mean**2
    return np.asarray(mean), np.asarray(jnp.sqrt(var))


@pytest.mark.slow
def test_predictive_envelope_parity(rng, key):
    model, data = _problem(rng)
    Xstar = np.linspace(0, 3, 15)

    # our sampler
    thetas0 = model.hyperprior.sample(key, (8,))
    u0 = jax.vmap(model.u_of_theta)(thetas0)
    res = nuts.sample(
        model_logp(model, data), u0, key, num_warmup=300, num_samples=400
    )
    thetas_ours = np.asarray(
        jax.vmap(jax.vmap(model.theta_of_u))(res.u)
    ).reshape(-1, 2)[::8]

    # ensemble oracle on the same posterior
    lp_jit = jax.jit(lambda t: model.log_posterior(t, data))
    chain, _, acc = run_ensemble(
        lambda t: float(lp_jit(jnp.asarray(t))),
        np.asarray(model.hyperprior.sample(jax.random.PRNGKey(5), (16,))),
        1200,
        rng,
    )
    assert acc > 0.1
    thetas_oracle = chain[400:].reshape(-1, 2)[::24]

    m1, s1 = _predictive_envelope(model, data, thetas_ours, Xstar)
    m2, s2 = _predictive_envelope(model, data, thetas_oracle, Xstar)

    # envelopes agree within MC error of the hyperparameter posteriors
    scale = np.maximum(s2, 1e-3)
    assert np.max(np.abs(m1 - m2) / scale) < 0.5, np.abs(m1 - m2) / scale
    assert np.max(np.abs(s1 - s2) / scale) < 0.5


def test_predictive_math_vs_numpy_oracle(rng):
    """Single-theta predictive mean/cov vs the independent numpy GP oracle
    (complements test_evidence_oracle with the derivative-augmented set)."""
    from tests.oracle import gp_numpy as oracle

    model, data = _problem(rng)
    sf, ell = 1.2, 0.8
    Xstar = np.array([0.7, 1.9])
    pred = model.predict(
        jnp.array([sf, ell]), data, Xstar, return_cov=True
    )
    X = np.asarray(data.Xf)[:, 0]
    n = [data.multi_indices[i][0] for i in np.asarray(data.nid)]
    mean_o, cov_o = oracle.se_predict(
        X,
        np.asarray(data.y),
        np.asarray(data.err_y),
        n,
        Xstar,
        [0, 0],
        sf,
        ell,
    )
    np.testing.assert_allclose(np.asarray(pred.mean), mean_o, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pred.cov), cov_o, rtol=1e-4, atol=1e-8)
