"""Parallel-tempering (replica-exchange HMC) sampler: analytic-target
moments, swap-move correctness, and multimodal mixing that plain HMC cannot
achieve (the PTSampler-parity feature — SURVEY.md section 2.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from gptools_tpu.infer import pt
from tests.test_samplers import _ToyModel


def test_geometric_ladder():
    b = np.asarray(pt.geometric_ladder(5, 0.1))
    assert b[0] == 1.0
    np.testing.assert_allclose(b[-1], 0.1, rtol=1e-6)
    assert (np.diff(b) < 0).all()
    np.testing.assert_allclose(b[1:] / b[:-1], b[1] / b[0], rtol=1e-6)
    assert np.asarray(pt.geometric_ladder(1)).shape == (1,)


def test_swap_step_conserves_state():
    """Replica exchange permutes (position, ll) pairs within each chain
    column — the multiset of states must be exactly conserved, and forced
    swaps must actually move states between adjacent rungs."""
    T, C, P = 5, 3, 2
    key = jax.random.PRNGKey(0)
    u = jnp.arange(T * C * P, dtype=jnp.float64).reshape(T, C, P)
    ll = jnp.arange(T * C, dtype=jnp.float64).reshape(T, C)
    betas = jnp.asarray(pt.geometric_ladder(T, 0.1, jnp.float64))

    for parity in (0, 1):
        (u2,), ll2, frac = pt._swap_step([u], ll, betas, key, parity)
        # conservation per chain column
        for c in range(C):
            assert sorted(np.asarray(ll2[:, c]).tolist()) == sorted(
                np.asarray(ll[:, c]).tolist()
            )
            got = {tuple(r) for r in np.asarray(u2[:, c, :])}
            want = {tuple(r) for r in np.asarray(u[:, c, :])}
            assert got == want
        # ll increases along rungs here, and hotter rungs have lower beta, so
        # every ACTIVE pair has log_acc > 0 -> guaranteed swap
        active = [t for t in range(T - 1) if t % 2 == parity]
        np.testing.assert_allclose(np.asarray(frac)[active], 1.0)
        inactive = [t for t in range(T - 1) if t % 2 != parity]
        np.testing.assert_allclose(np.asarray(frac)[inactive], 0.0)
        for t in active:
            np.testing.assert_array_equal(np.asarray(ll2[t]), np.asarray(ll[t + 1]))
            np.testing.assert_array_equal(np.asarray(u2[t]), np.asarray(u[t + 1]))


def test_pt_conjugate_gaussian_moments(key):
    model = _ToyModel()
    res = pt.sample(
        model,
        None,
        key,
        num_chains=8,
        num_temps=4,
        num_warmup=300,
        num_samples=500,
        num_steps=12,
    )
    assert res.u.shape == (8, 500, 2)
    assert res.thetas.shape == (8, 500, 2)
    flat = np.asarray(res.thetas).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), model.y / 2, atol=0.1)
    np.testing.assert_allclose(flat.var(axis=0), [0.5, 0.5], atol=0.12)
    d = res.diagnostics
    assert d["betas"].shape == (4,)
    assert d["step_size"].shape == (4,)
    assert d["swap_accept"].shape == (3,)
    # adjacent rungs of a geometric ladder on a unimodal target swap freely
    assert (np.asarray(d["swap_accept"]) > 0.2).all()
    assert np.isfinite(np.asarray(res.log_prob)).all()
    assert float(d["mean_accept"]) > 0.5


class _BimodalModel(_ToyModel):
    """Likelihood = equal mixture of N(+-m, 0.3^2 I): far-separated modes the
    cold chain cannot cross unaided."""

    m = np.array([3.0, 0.0])

    def __init__(self):
        from gptools_tpu.utils.priors import NormalJointPrior

        self.hyperprior = NormalJointPrior([0.0, 0.0], [3.0, 3.0])
        self.bijector = self.hyperprior.bijector()

    def log_marginal(self, theta, data):
        mu = jnp.asarray(self.m)
        s2 = 0.09
        la = -0.5 * jnp.sum((theta - mu) ** 2) / s2
        lb = -0.5 * jnp.sum((theta + mu) ** 2) / s2
        return jnp.logaddexp(la, lb) - jnp.log(2.0)


def test_pt_mixes_between_far_modes(key):
    """The reason PT exists: hot rungs see a nearly-flat likelihood and
    wander freely; replica exchange ferries cold chains across the barrier.
    By symmetry each mode must receive ~half the cold-rung mass."""
    model = _BimodalModel()
    res = pt.sample(
        model,
        None,
        key,
        num_chains=16,
        num_temps=6,
        beta_min=0.02,
        num_warmup=400,
        num_samples=600,
        num_steps=12,
        adapt_mass=False,  # bimodal pooled variance would mis-scale the mass
    )
    x = np.asarray(res.thetas[..., 0]).ravel()
    frac_right = float((x > 0).mean())
    assert 0.25 < frac_right < 0.75, frac_right
    # samples concentrate near the two modes, not the barrier
    assert float((np.abs(np.abs(x) - 3.0) < 1.0).mean()) > 0.9
    # swaps must actually be happening for this to work
    assert (np.asarray(res.diagnostics["swap_accept"]) > 0.05).all()


def test_pt_metrics_logging(key, tmp_path):
    """metrics= hook: PT windows stream step sizes and swap fractions."""
    from gptools_tpu.utils.metrics import MetricsLogger

    model = _ToyModel()
    log = MetricsLogger(path=str(tmp_path / "pt.jsonl"), run_name="pt-test")
    pt.sample(
        model, None, key,
        num_chains=4, num_temps=3, num_warmup=30, num_samples=30,
        num_steps=6, metrics=log,
    )
    windows = [r for r in log.records if r["event"] == "window"]
    assert windows and all("mean_swap_frac" in w for w in windows)
    assert any(w["phase"] == "pt-sampling" for w in windows)
    assert (tmp_path / "pt.jsonl").exists()


def test_pt_checkpoint_resume(tmp_path, key):
    """PT carry is an orbax-checkpointable pytree: save mid-run, restore,
    continue == uninterrupted (SURVEY.md section 5 checkpoint requirement)."""
    import os

    from gptools_tpu.infer.hmc import da_init, WelfordState
    from gptools_tpu.infer.pt import _PTCarry, _make_chunk_runner, geometric_ladder, model_splits
    from gptools_tpu.utils.checkpoint import restore_state, save_state

    model = _ToyModel()
    log_like, log_prior = model_splits(model, None)
    T, C, P = 3, 4, 2
    betas = geometric_ladder(T, 0.1, jnp.float64)
    runner = _make_chunk_runner(log_like, log_prior, betas, 6, 0.8, 0.2)

    def fresh(key_):
        return _PTCarry(
            u=0.1 * jnp.ones((T, C, P), jnp.float64),
            da=da_init(jnp.full((T,), 0.1, jnp.float64)),
            welford=WelfordState(
                jnp.zeros((T,), jnp.float64),
                jnp.zeros((T, P), jnp.float64),
                jnp.zeros((T, P), jnp.float64),
            ),
            inv_mass=jnp.ones((T, P), jnp.float64),
            step=jnp.zeros((), jnp.int32),
            key=key_,
        )

    # uninterrupted: 2 x 10 sweeps
    c_a, _ = runner(fresh(key), 10, True, True)
    c_b, outs_b = runner(c_a, 10, True, True)

    # interrupted: checkpoint after 10, restore, continue
    state = {"carry": c_a._asdict()}
    path = os.path.join(tmp_path, "pt-resume")
    save_state(path, state)
    back = restore_state(path, template=state)
    c_r = _PTCarry(**back["carry"])
    c_c, outs_c = runner(c_r, 10, True, True)

    np.testing.assert_allclose(np.asarray(c_c.u), np.asarray(c_b.u), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(c_c.da.log_eps), np.asarray(c_b.da.log_eps), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(outs_c["u_cold"]), np.asarray(outs_b["u_cold"]), rtol=1e-12
    )
