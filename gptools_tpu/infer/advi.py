"""Automatic Differentiation Variational Inference over GP hyperparameters.

No reference counterpart (gptools predates VI tooling); required by the
north star as the third inference family next to NUTS/HMC and SMC. Standard
ADVI (Kucukelbir et al. 2017): a Gaussian in the unconstrained bijector
space — mean-field (diagonal) or full-rank (Cholesky-parameterized) —
reparameterized ELBO gradients, optax Adam, vmapped Monte Carlo samples;
each ELBO sample is one batched-Cholesky evidence evaluation, so the whole
fit is a single fused scan on-chip.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gptools_tpu.infer.hmc import SampleResult

__all__ = ["sample", "ADVIResult"]


class ADVIResult(NamedTuple):
    mu: jax.Array
    log_sigma: jax.Array          # diagonal log-scales
    elbo_trace: jax.Array
    chol_offdiag: jax.Array = None  # strictly-lower factor entries (full-rank)


@functools.lru_cache(maxsize=64)
def _fit_program(
    logp, num_steps: int, num_elbo_samples: int, learning_rate: float,
    full_rank: bool,
):
    """Jitted ELBO-maximization scan cached on the density function's
    identity + static config (the `infer.model_logp` reuse contract — see
    `chees._build_programs`). Takes (u0, key), returns (params, elbos);
    the dimension is read from u0's static shape at trace time."""
    opt = optax.adam(learning_rate)

    @jax.jit
    def run(u0, key):
        nf = u0.shape[0]
        params = {
            "mu": u0,
            "log_sigma": jnp.full((nf,), -2.0, u0.dtype),
        }
        if full_rank:
            params["off"] = jnp.zeros((nf * (nf - 1) // 2,), u0.dtype)
            tril_r, tril_c = jnp.tril_indices(nf, k=-1)

        def neg_elbo(params, key):
            z = jax.random.normal(key, (num_elbo_samples, nf), u0.dtype)
            if full_rank:
                L = jnp.diag(jnp.exp(params["log_sigma"]))
                L = L.at[tril_r, tril_c].set(params["off"])
                us = params["mu"] + z @ L.T
            else:
                us = params["mu"] + jnp.exp(params["log_sigma"]) * z
            lps = jax.vmap(logp)(us)
            lps = jnp.where(jnp.isfinite(lps), lps, -1e30)
            # entropy of N(mu, L L^T): sum log diag L + const
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
        (params, _), elbos = jax.lax.scan(
            step, (params, opt.init(params)), keys
        )
        return params, elbos

    return run


def fit(
    model,
    data,
    key: jax.Array,
    num_steps: int = 1500,
    num_elbo_samples: int = 16,
    learning_rate: float = 0.05,
    full_rank: bool = False,
) -> ADVIResult:
    """Fit q(u) = N(mu, Sigma) maximizing the ELBO; ``full_rank=False`` uses
    Sigma = diag(sigma^2), ``True`` a dense Cholesky factor."""
    from gptools_tpu.infer import model_logp  # circular-safe

    u0 = model.u_of_theta(jnp.asarray(model.initial_params))
    run = _fit_program(
        model_logp(model, data), int(num_steps), int(num_elbo_samples),
        float(learning_rate), bool(full_rank),
    )
    params, elbos = run(u0, key)
    return ADVIResult(
        mu=params["mu"],
        log_sigma=params["log_sigma"],
        elbo_trace=elbos,
        chol_offdiag=params.get("off"),
    )


def sample(
    model,
    data,
    key: jax.Array,
    num_samples: int = 1000,
    num_steps: int = 1500,
    num_elbo_samples: int = 16,
    learning_rate: float = 0.05,
    full_rank: bool = False,
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
        full_rank=full_rank,
    )
    nf = res.mu.shape[0]
    sigma = jnp.exp(res.log_sigma)
    z = jax.random.normal(k_draw, (num_samples, nf), res.mu.dtype)
    if full_rank and res.chol_offdiag is not None:
        tril_r, tril_c = jnp.tril_indices(nf, k=-1)
        L = jnp.diag(sigma).at[tril_r, tril_c].set(res.chol_offdiag)
        us = res.mu + z @ L.T
    else:
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
