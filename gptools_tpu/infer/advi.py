"""Automatic Differentiation Variational Inference (mean-field) over GP
hyperparameters.

No reference counterpart (gptools predates VI tooling); required by the
north star as the third inference family next to NUTS/HMC and SMC. Standard
ADVI (Kucukelbir et al. 2017): a diagonal Gaussian in the unconstrained
bijector space, reparameterized ELBO gradients, optax Adam, vmapped Monte
Carlo samples — each ELBO sample is one batched-Cholesky evidence
evaluation, so the whole fit is a single fused scan on-chip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gptools_tpu.infer.hmc import SampleResult

__all__ = ["sample", "ADVIResult"]


class ADVIResult(NamedTuple):
    mu: jax.Array
    log_sigma: jax.Array
    elbo_trace: jax.Array


def fit(
    model,
    data,
    key: jax.Array,
    num_steps: int = 1500,
    num_elbo_samples: int = 16,
    learning_rate: float = 0.05,
) -> ADVIResult:
    """Fit q(u) = N(mu, diag(sigma^2)) maximizing the ELBO."""
    nf = model.num_free_params

    def logp(u):
        return model.log_posterior_u(u, data)

    u0 = model.u_of_theta(jnp.asarray(model.initial_params))
    params = {
        "mu": u0,
        "log_sigma": jnp.full((nf,), -2.0, u0.dtype),
    }
    opt = optax.adam(learning_rate)

    def neg_elbo(params, key):
        sigma = jnp.exp(params["log_sigma"])
        z = jax.random.normal(key, (num_elbo_samples, nf), u0.dtype)
        us = params["mu"] + sigma * z
        lps = jax.vmap(logp)(us)
        lps = jnp.where(jnp.isfinite(lps), lps, -1e30)
        entropy = jnp.sum(params["log_sigma"]) + 0.5 * nf * (
            1.0 + jnp.log(2.0 * jnp.pi)
        )
        return -(jnp.mean(lps) + entropy)

    def step(carry, key):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(neg_elbo)(params, key)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    keys = jax.random.split(key, num_steps)
    (params, _), elbos = jax.lax.scan(step, (params, opt.init(params)), keys)
    return ADVIResult(
        mu=params["mu"], log_sigma=params["log_sigma"], elbo_trace=elbos
    )


def sample(
    model,
    data,
    key: jax.Array,
    num_samples: int = 1000,
    num_steps: int = 1500,
    num_elbo_samples: int = 16,
    learning_rate: float = 0.05,
    **_,
) -> SampleResult:
    """Fit ADVI, then draw ``num_samples`` posterior-approximation samples."""
    k_fit, k_draw = jax.random.split(key)
    res = fit(
        model,
        data,
        k_fit,
        num_steps=num_steps,
        num_elbo_samples=num_elbo_samples,
        learning_rate=learning_rate,
    )
    sigma = jnp.exp(res.log_sigma)
    z = jax.random.normal(k_draw, (num_samples, res.mu.shape[0]), res.mu.dtype)
    us = res.mu + sigma * z
    thetas = jax.vmap(model.theta_of_u)(us)
    lps = jax.vmap(lambda u: model.log_posterior_u(u, data))(us)
    diagnostics = {
        "elbo_trace": res.elbo_trace,
        "mu": res.mu,
        "sigma": sigma,
        "final_elbo": res.elbo_trace[-1],
    }
    return SampleResult(
        u=us[None], thetas=thetas[None], log_prob=lps[None], diagnostics=diagnostics
    )
