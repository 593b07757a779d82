"""Sampler correctness on analytic targets + the NUTS U-turn index scheme
against a brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptools_tpu.infer import advi, hmc, map_fit, nuts, smc


# ---------------------------------------------------------------------------
# analytic target: correlated 3-D Gaussian
# ---------------------------------------------------------------------------
_A = np.array(
    [[2.0, 0.6, -0.3], [0.6, 1.0, 0.4], [-0.3, 0.4, 1.5]]
)
_COV = _A @ _A.T
_PREC = np.linalg.inv(_COV)
_MEAN = np.array([1.0, -2.0, 0.5])


def gauss_logp(u):
    d = u - jnp.asarray(_MEAN)
    return -0.5 * d @ jnp.asarray(_PREC) @ d


def _check_moments(samples, mean_tol, cov_tol):
    flat = np.asarray(samples).reshape(-1, 3)
    m = flat.mean(axis=0)
    c = np.cov(flat.T)
    np.testing.assert_allclose(m, _MEAN, atol=mean_tol)
    np.testing.assert_allclose(c, _COV, atol=cov_tol)


def test_hmc_gaussian_moments(key):
    u0 = jax.random.normal(key, (8, 3))
    res = hmc.sample(
        gauss_logp, u0, key, num_warmup=400, num_samples=800, num_steps=16
    )
    assert res.u.shape == (8, 800, 3)
    assert float(res.diagnostics["mean_accept"]) > 0.5
    _check_moments(res.u, 0.15, 0.6)


def test_nuts_gaussian_moments(key):
    u0 = jax.random.normal(key, (8, 3))
    res = nuts.sample(gauss_logp, u0, key, num_warmup=400, num_samples=800)
    assert float(res.diagnostics["divergences"]) == 0
    _check_moments(res.u, 0.1, 0.5)
    # NUTS should take multiple leapfrogs per iteration on a correlated target
    assert int(res.diagnostics["num_leapfrog_total"]) > 800 * 8


def test_nuts_banana_no_nans(key):
    """Rosenbrock-like target: stresses divergences and step adaptation."""

    def logp(u):
        return -0.5 * (u[0] ** 2 / 9.0 + (u[1] - u[0] ** 2 / 4.0) ** 2)

    u0 = 0.1 * jax.random.normal(key, (4, 2))
    res = nuts.sample(logp, u0, key, num_warmup=300, num_samples=500)
    assert np.isfinite(np.asarray(res.u)).all()
    # x-marginal is N(0, 9)
    xs = np.asarray(res.u[..., 0]).ravel()
    assert abs(xs.mean()) < 0.5
    assert abs(xs.std() - 3.0) < 0.6


def test_uturn_checkpoint_indexing_matches_bruteforce():
    """The popcount/trailing-zero checkpoint scheme must generate EXACTLY the
    balanced-subtree U-turn checks of recursive NUTS (Hoffman & Gelman 2014 /
    Betancourt 2017), for every subtree size up to 2^6."""
    for depth in range(1, 7):
        n = 1 << depth
        # brute force: all balanced blocks [a, b]: a = m 2^k, b = a + 2^k - 1, k >= 1
        want = set()
        for k in range(1, depth + 1):
            size = 1 << k
            for a in range(0, n, size):
                want.add((a, a + size - 1))
        # iterative scheme
        got = set()
        store = {}
        for i in range(n):
            if i % 2 == 0:
                store[bin(i).count("1")] = i
            m = i + 1
            pc = bin(m).count("1")
            tz = len(bin(m)) - len(bin(m).rstrip("0")) if m % 2 == 0 else 0
            s_lo = pc - 1
            s_hi = pc - 2 + tz
            for s in range(s_lo, s_hi + 1):
                got.add((store[s], i))
        assert got == want, (depth, got ^ want)


def test_dual_averaging_converges_to_target():
    """Feeding accept = sigmoid-like response drives eps toward equilibrium."""
    da = hmc.da_init(jnp.asarray(0.5))
    for _ in range(200):
        eps = float(jnp.exp(da.log_eps))
        accept = 1.0 / (1.0 + eps)  # pretend accept falls with step size
        da = hmc.da_update(da, jnp.asarray(accept), target=0.8)
    eps_final = float(jnp.exp(da.log_eps_avg))
    # equilibrium of 1/(1+eps) = 0.8 is eps = 0.25
    assert abs(eps_final - 0.25) < 0.05


def test_welford_matches_numpy(rng):
    xs = rng.standard_normal((1000, 4)) * np.array([1.0, 2.0, 0.5, 3.0])
    st = hmc.welford_init(4, jnp.float64)
    for chunk in np.split(xs, 10):
        st = hmc.welford_update_batch(st, jnp.asarray(chunk))
    var = np.asarray(hmc.welford_variance(st, regularize=False))
    np.testing.assert_allclose(var, xs.var(axis=0, ddof=1), rtol=1e-10)


def test_warmup_schedule_partitions():
    for n in [30, 100, 500, 1000, 2777]:
        sched = hmc.warmup_schedule(n)
        assert sum(l for _, l in sched) == n
        phases = [p for p, _ in sched]
        assert phases[0] == "fast" and phases[-1] == "fast"
        assert "slow" in phases


# ---------------------------------------------------------------------------
# SMC on an analytic conjugate problem: known evidence + moments
# ---------------------------------------------------------------------------
class _ToyModel:
    """Minimal stand-in implementing the model protocol smc.sample needs:
    prior N(0, I), likelihood N(y | u, I) for a single 2-D observation.
    Posterior: N(y/2, I/2); evidence: N(y | 0, 2I)."""

    num_params = 2
    num_free_params = 2
    free_idx = (0, 1)
    initial_params = (0.0, 0.0)
    y = np.array([1.0, -0.5])

    def __init__(self):
        from gptools_tpu.utils.priors import NormalJointPrior

        self.hyperprior = NormalJointPrior([0.0, 0.0], [1.0, 1.0])
        self.bijector = self.hyperprior.bijector()

    def u_of_theta(self, theta):
        return theta

    def theta_of_u(self, u):
        return u

    def log_prior(self, theta):
        return self.hyperprior.log_prob(theta)

    def log_marginal(self, theta, data):
        d = theta - jnp.asarray(self.y)
        return -0.5 * jnp.sum(d * d) - jnp.log(2 * jnp.pi)

    def log_posterior_u(self, u, data):
        return self.log_prior(u) + self.log_marginal(u, data)


def test_smc_conjugate_gaussian(key):
    model = _ToyModel()
    res = smc.sample(model, None, key, num_particles=2048, num_mutations=5)
    post_mean = np.asarray(res.thetas[0]).mean(axis=0)
    np.testing.assert_allclose(post_mean, model.y / 2, atol=0.08)
    post_var = np.asarray(res.thetas[0]).var(axis=0)
    np.testing.assert_allclose(post_var, [0.5, 0.5], atol=0.08)
    # analytic evidence: N(y | 0, 2I)
    want_logz = (
        -0.5 * np.sum(model.y**2) / 2.0 - np.log(2 * np.pi * 2.0)
    )
    assert np.isclose(float(res.diagnostics["log_evidence"]), want_logz, atol=0.1)


def test_advi_gaussian_recovers_exactly(key):
    model = _ToyModel()
    res = advi.sample(model, None, key, num_samples=2000, num_steps=800)
    mu = np.asarray(res.diagnostics["mu"])
    sigma = np.asarray(res.diagnostics["sigma"])
    np.testing.assert_allclose(mu, model.y / 2, atol=0.05)
    np.testing.assert_allclose(sigma, np.sqrt(0.5), atol=0.05)


@pytest.mark.slow
def test_map_on_gp(rng, key):
    """Config-1 smoke: MAP on a 1-D SE GP recovers sane hyperparameters."""
    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.ops.kernels import SquaredExponentialKernel
    from gptools_tpu.utils.priors import LogNormalJointPrior

    X = np.linspace(0, 3, 40)
    y = np.sin(2 * X) + 0.1 * rng.standard_normal(40)
    b = DatasetBuilder(1)
    b.add(X, y, err_y=0.1)
    data = b.build()
    prior = LogNormalJointPrior([0.0, -1.0], [1.0, 1.0])
    model = GPModel(SquaredExponentialKernel(hyperprior=prior))
    res = map_fit.optimize(model, data, key, random_starts=6, num_steps=100)
    assert np.isfinite(float(res.log_posterior))
    sf, ell = np.asarray(res.theta)
    # sin(2x): length scale order ~0.2-1.5, amplitude order ~0.3-3
    assert 0.1 < ell < 2.0, ell
    assert 0.2 < sf < 4.0, sf
    # optimum beats the initial point
    u0 = model.u_of_theta(jnp.asarray(model.initial_params))
    lp0 = float(model.log_posterior_u(u0, data))
    assert float(res.log_posterior) >= lp0


def test_chees_gaussian_moments(key):
    from gptools_tpu.infer import chees

    u0 = jax.random.normal(key, (32, 3))
    res = chees.sample(
        gauss_logp, u0, key, num_warmup=400, num_samples=500
    )
    assert res.u.shape == (32, 500, 3)
    assert float(res.diagnostics["mean_accept"]) > 0.4
    _check_moments(res.u, 0.12, 0.5)
    # trajectory length should have adapted away from its tiny initial value
    assert float(res.diagnostics["trajectory_time"]) > float(
        res.diagnostics["step_size"]
    )


def test_advi_full_rank_recovers_correlation(key):
    """Full-rank ADVI on a correlated Gaussian: the fitted covariance must
    capture the off-diagonal (mean-field cannot)."""
    from gptools_tpu.infer import advi

    class _CorrModel(_ToyModel):
        A = np.array([[1.0, 0.0], [0.9, 0.44]])
        COV = A @ A.T  # strong correlation
        PREC = np.linalg.inv(COV)

        def log_prior(self, theta):
            return jnp.zeros(())

        def log_marginal(self, theta, data):
            d = theta - jnp.asarray(self.y)
            return -0.5 * d @ jnp.asarray(self.PREC) @ d

        def log_posterior_u(self, u, data):
            return self.log_marginal(u, data)

    model = _CorrModel()
    res = advi.sample(
        model, None, key, num_samples=4000, num_steps=1200, full_rank=True
    )
    emp_cov = np.cov(np.asarray(res.u[0]).T)
    np.testing.assert_allclose(emp_cov, model.COV, atol=0.12)


@pytest.mark.slow
def test_smc_then_pipelines_quality(rng, key):
    """Both warm-start pipelines must produce well-mixed chains (Rhat close
    to 1) on a small GP posterior, and agree on moments."""
    from gptools_tpu.infer.pipeline import smc_then_chees, smc_then_nuts
    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.ops.kernels import SquaredExponentialKernel
    from gptools_tpu.utils.diagnostics import split_rhat
    from gptools_tpu.utils.priors import LogNormalJointPrior

    X = np.linspace(0, 3, 15)
    y = np.sin(1.5 * X) + 0.1 * rng.standard_normal(15)
    b = DatasetBuilder(1)
    b.add(X, y, err_y=0.1)
    data = b.build()
    model = GPModel(
        SquaredExponentialKernel(
            hyperprior=LogNormalJointPrior([0.0, -0.5], [0.75, 0.75])
        )
    )
    r1 = smc_then_chees(
        model, data, key, num_chains=64, num_warmup=100, num_samples=200,
        num_particles=256,
    )
    r2 = smc_then_nuts(
        model, data, key, num_chains=64, num_warmup=50, num_samples=200,
        num_particles=256,
    )
    assert np.asarray(split_rhat(r1.thetas)).max() < 1.1
    assert np.asarray(split_rhat(r2.thetas)).max() < 1.1
    m1 = np.asarray(r1.thetas).reshape(-1, 2).mean(0)
    m2 = np.asarray(r2.thetas).reshape(-1, 2).mean(0)
    np.testing.assert_allclose(m1, m2, rtol=0.1)
    assert "smc_log_evidence" in r1.diagnostics


def test_chees_batched_logp_identical(key):
    """`logp_batched` must reproduce the per-chain path EXACTLY (same random
    stream, same trajectories): the batched chains-minor density is a
    drop-in, not an approximation."""
    from gptools_tpu.infer import chees

    u0 = jax.random.normal(key, (16, 3))

    def batched(qs):
        return jax.vmap(gauss_logp)(qs)

    res_a = chees.sample(gauss_logp, u0, key, num_warmup=50, num_samples=50)
    res_b = chees.sample(
        gauss_logp, u0, key, num_warmup=50, num_samples=50,
        logp_batched=batched,
    )
    np.testing.assert_allclose(
        np.asarray(res_b.u), np.asarray(res_a.u), rtol=1e-10, atol=1e-12
    )
    assert int(res_a.diagnostics["num_leapfrog_total"]) == int(
        res_b.diagnostics["num_leapfrog_total"]
    )
