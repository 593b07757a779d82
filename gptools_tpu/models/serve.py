"""Serving: precomputed, jitted predictors for repeated low-latency queries.

No reference counterpart (the reference recomputes `K`, `L`, `alpha` lazily
inside a mutable object); in a production setting the fitted model is
queried many times at different locations, so the expensive state —
Cholesky factor and ``alpha = K^{-1}(y - mu)``, or a whole batch of them for
MCMC-marginalized prediction — is computed ONCE and closed over by a jitted
query function. Queries re-specialize per (num_points, derivative-order)
shape, which JAX caches; an optional bucketing pad keeps the number of
specializations bounded for ragged query sizes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FrozenPredictor", "FrozenMCMCPredictor"]


def _pad_to_bucket(X: np.ndarray, bucket: int):
    n = X.shape[0]
    if bucket <= 1:
        return X, n
    m = ((n + bucket - 1) // bucket) * bucket
    if m == n:
        return X, n
    pad = np.repeat(X[-1:], m - n, axis=0)
    return np.concatenate([X, pad], axis=0), n


class FrozenPredictor:
    """Point-estimate predictor: fixed (model, data, theta)."""

    def __init__(self, model, data, theta, bucket: int = 64):
        self.model = model
        self.data = data
        self.theta = jnp.asarray(theta)
        self.bucket = int(bucket)
        self.state = model.compute_K_L_alpha_ll(self.theta, data)

        @partial(jax.jit, static_argnums=(1, 2))
        def _query(Xstar, n, return_std):
            pred = model.predict(
                self.theta,
                data,
                Xstar,
                n=n,
                return_std=return_std,
                state=self.state,
            )
            return (pred.mean, pred.std) if return_std else pred.mean

        self._query = _query

    def __call__(self, Xstar, n: int = 0, return_std: bool = True):
        X = np.atleast_2d(np.asarray(Xstar, dtype=float))
        if X.shape[-1] != self.data.num_dim:
            X = X.reshape(-1, self.data.num_dim)
        Xp, n_real = _pad_to_bucket(X, self.bucket)
        out = self._query(jnp.asarray(Xp), int(n), bool(return_std))
        if return_std:
            return out[0][:n_real], out[1][:n_real]
        return out[:n_real]


class FrozenMCMCPredictor:
    """Fully-Bayesian predictor: a batch of posterior thetas, states
    precomputed with one batched Cholesky, envelope queries jitted."""

    def __init__(self, model, data, thetas, max_samples: int = 512, bucket: int = 64):
        self.model = model
        self.data = data
        thetas = jnp.asarray(thetas).reshape(-1, model.num_params)
        if thetas.shape[0] > max_samples:
            idx = np.linspace(0, thetas.shape[0] - 1, max_samples).astype(int)
            thetas = thetas[jnp.asarray(idx)]
        self.thetas = thetas
        self.bucket = int(bucket)
        self.states = jax.jit(
            jax.vmap(lambda t: model.compute_K_L_alpha_ll(t, data))
        )(thetas)

        @partial(jax.jit, static_argnums=(1,))
        def _query(Xstar, n):
            def one(theta, state):
                pred = model.predict(
                    theta, data, Xstar, n=n, return_std=True, state=state
                )
                return pred.mean, pred.std

            means, stds = jax.vmap(one)(self.thetas, self.states)
            mean = jnp.mean(means, axis=0)
            var = jnp.mean(stds**2 + means**2, axis=0) - mean**2
            return mean, jnp.sqrt(jnp.clip(var, 0.0))

        self._query = _query

    def __call__(self, Xstar, n: int = 0):
        X = np.atleast_2d(np.asarray(Xstar, dtype=float))
        if X.shape[-1] != self.data.num_dim:
            X = X.reshape(-1, self.data.num_dim)
        Xp, n_real = _pad_to_bucket(X, self.bucket)
        mean, std = self._query(jnp.asarray(Xp), int(n))
        return mean[:n_real], std[:n_real]
