"""Priors: normalization/moments vs scipy; bijectors: round-trip + Jacobians."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from gptools_tpu.utils import bijectors as bij
from gptools_tpu.utils import priors as pr


def test_uniform_prior():
    p = pr.UniformJointPrior([0.0, 1.0], [2.0, 3.0])
    assert p.dim == 2
    lp = float(p.log_prob(jnp.array([1.0, 2.0])))
    assert np.isclose(lp, -np.log(2.0 * 2.0))
    assert float(p.log_prob(jnp.array([-1.0, 2.0]))) == -np.inf
    s = p.sample(jax.random.PRNGKey(0), (1000,))
    assert s.shape == (1000, 2)
    assert (s[:, 0] >= 0).all() and (s[:, 1] <= 3).all()


@pytest.mark.parametrize(
    "prior,scipy_dist,x",
    [
        (pr.NormalJointPrior([1.0], [2.0]), st.norm(1.0, 2.0), 0.3),
        (pr.LogNormalJointPrior([0.5], [0.8]), st.lognorm(0.8, scale=np.exp(0.5)), 1.7),
        (pr.GammaJointPrior([2.0], [3.0]), st.gamma(2.0, scale=3.0), 4.2),
        (pr.ExponentialJointPrior([1.5]), st.expon(scale=1 / 1.5), 0.9),
    ],
)
def test_prior_logpdf_vs_scipy(prior, scipy_dist, x):
    got = float(prior.log_prob(jnp.array([x])))
    want = scipy_dist.logpdf(x)
    assert np.isclose(got, want, rtol=1e-10)


def test_gamma_alt_mode_std():
    p = pr.GammaJointPriorAlt([2.0], [0.5])
    s = np.asarray(p.sample(jax.random.PRNGKey(1), (200000,)))[:, 0]
    # mode check via parameters: mode = (a-1)*b
    a, b = p.a[0], p.b[0]
    assert np.isclose((a - 1) * b, 2.0, rtol=1e-12)
    assert np.isclose(np.sqrt(a) * b, 0.5, rtol=1e-12)
    assert np.isclose(s.std(), 0.5, rtol=2e-2)


def test_sorted_uniform_prior():
    p = pr.SortedUniformJointPrior(3, 0.0, 1.0)
    assert np.isclose(
        float(p.log_prob(jnp.array([0.1, 0.5, 0.9]))), np.log(6.0)
    )
    assert float(p.log_prob(jnp.array([0.5, 0.1, 0.9]))) == -np.inf
    s = np.asarray(p.sample(jax.random.PRNGKey(0), (100,)))
    assert (np.diff(s, axis=-1) > 0).all()


def test_product_prior_concat():
    p = pr.UniformJointPrior([0.0], [1.0]) * pr.NormalJointPrior([0.0], [1.0])
    assert p.dim == 2
    lp = float(p.log_prob(jnp.array([0.5, 0.0])))
    want = 0.0 + st.norm(0, 1).logpdf(0.0)
    assert np.isclose(lp, want)


def test_independent_prior():
    p = pr.IndependentJointPrior([pr.Uniform(0, 2), pr.Gamma(2.0, 1.0)])
    lp = float(p.log_prob(jnp.array([1.0, 2.0])))
    want = -np.log(2.0) + st.gamma(2.0).logpdf(2.0)
    assert np.isclose(lp, want)


@pytest.mark.parametrize(
    "b",
    [
        bij.IdentityBijector(2),
        bij.ExpBijector(0.5, 1),
        bij.SoftplusBijector(0.0, 1),
        bij.SigmoidBijector(-1.0, 3.0, 1),
        bij.NegExpBijector(2.0, 1),
        bij.OrderedIntervalBijector(0.0, 1.0, 4),
        bij.ConcatBijector(
            [bij.SoftplusBijector(0.0, 1), bij.SigmoidBijector(0.0, 1.0, 1)]
        ),
    ],
)
def test_bijector_roundtrip_and_jacobian(b):
    u = jnp.linspace(-1.2, 0.8, b.dim)
    x = b.forward(u)
    u2 = b.inverse(x)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), rtol=1e-6, atol=1e-8)
    # log|det J| vs autodiff jacobian
    J = jax.jacfwd(b.forward)(u)
    want = np.linalg.slogdet(np.asarray(J))[1]
    got = float(b.log_det_jac(u))
    assert np.isclose(got, want, rtol=1e-8), (got, want)


def test_ordered_bijector_orders():
    b = bij.OrderedIntervalBijector(0.0, 2.0, 5)
    x = b.forward(jnp.array([0.3, -1.0, 2.0, 0.0, -0.5]))
    assert (np.diff(np.asarray(x)) > 0).all()
    assert (np.asarray(x) > 0).all() and (np.asarray(x) < 2).all()


def test_bijector_from_bounds_dispatch():
    b = bij.bijector_from_bounds([(0.0, np.inf), (-np.inf, np.inf), (0.0, 1.0)])
    x = b.forward(jnp.array([0.1, 0.2, 0.3]))
    assert float(x[0]) > 0 and 0 < float(x[2]) < 1
