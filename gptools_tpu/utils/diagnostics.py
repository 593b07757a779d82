"""Chain diagnostics: ESS, split-R-hat, posterior summaries.

TPU-native counterpart of the reference's post-hoc sampler diagnostics
(``gptools/utils.py :: summarize_sampler, compute_stats`` — SURVEY.md
section 5, metrics row). ESS/s is the north-star metric (BASELINE.json), so
the effective-sample-size estimator here is the standard one used to judge
parity: per-chain FFT autocorrelation, Geyer initial-monotone-positive-
sequence truncation, combined across chains (Vehtari et al. 2021 "bulk ESS"
without rank-normalization; a rank-normalized variant is provided for
robustness checks). Everything is jittable jnp so ESS can be computed
on-device inside the benchmark loop.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["autocorr", "ess", "split_rhat", "summarize_samples", "ess_per_param", "ess_and_rhat", "rank_normalize", "bulk_ess_per_param"]


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def autocorr(x: jax.Array) -> jax.Array:
    """Normalized autocorrelation function of a 1-D (or batched ...xN) series
    via FFT. Returns same shape; lag axis is the last."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    m = _next_pow2(n) * 2
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    f = jnp.fft.rfft(xc, n=m, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=-1)[..., :n]
    # zero-variance (stuck) series: define autocorr = 0 instead of 0/0
    a0 = acov[..., :1]
    return jnp.where(a0 > 0, acov / jnp.where(a0 > 0, a0, 1.0), 0.0)


def ess(chains: jax.Array) -> jax.Array:
    """Effective sample size of scalar chains, shape (num_chains, num_samples).

    Combined-chain estimator: mean autocorrelation across chains with
    between-chain variance correction (Vehtari et al. 2021, eq. for
    rho_hat_t), truncated by Geyer's initial monotone positive sequence.
    """
    chains = jnp.atleast_2d(jnp.asarray(chains))
    m, n = chains.shape
    acov = autocorr(chains) * jnp.var(chains, axis=-1, keepdims=True)
    mean_acov = jnp.mean(acov, axis=0)  # (n,)
    w = jnp.mean(jnp.var(chains, axis=-1, ddof=1))  # within-chain var
    var_plus = w * (n - 1) / n
    if m > 1:
        b = n * jnp.var(jnp.mean(chains, axis=-1), ddof=1)
        var_plus = var_plus + b / n
    rho = 1.0 - (w - mean_acov) / var_plus  # (n,)

    # Geyer: sum consecutive pairs, keep while positive and monotone decreasing
    n_pairs = n // 2
    pair = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)
    # enforce monotone non-increasing via running min, then clip at 0
    pair_mono = jax.lax.associative_scan(jnp.minimum, pair)
    positive = pair_mono > 0
    # stop at first non-positive pair
    keep = jnp.cumprod(positive.astype(pair.dtype))
    tau = -1.0 + 2.0 * jnp.sum(pair_mono * keep)
    tau = jnp.maximum(tau, 1.0 / jnp.asarray(n, rho.dtype))
    return m * n / tau


def _host_layout(samples: jax.Array) -> jax.Array:
    """Normalize a concrete post-run array to a fresh default-layout device
    array. Mesh runs can hand diagnostics sharded / non-default-layout
    arrays, which XLA:CPU's FFT thunk rejects outright (RET_CHECK
    `IsMonotonicWithDim0Major` — observed in the r4 full-suite log from the
    config-5 sharded pipeline). Diagnostics are host-side post-processing,
    so a host round-trip is both safe and cheap here; tracers pass through
    untouched."""
    if isinstance(samples, jax.core.Tracer):
        return samples
    return jnp.asarray(np.asarray(samples))


def ess_per_param(samples: jax.Array) -> jax.Array:
    """ESS for each parameter of (num_chains, num_samples, dim) samples."""
    samples = _host_layout(jnp.asarray(samples))
    if samples.ndim == 2:
        samples = samples[None]
    return jax.jit(jax.vmap(ess, in_axes=2))(samples)


def _split_rhat_core(samples: jax.Array) -> jax.Array:
    """Pure-jnp split-R-hat for (num_chains, num_samples, dim) samples
    (jittable; no layout normalization)."""
    c, n, d = samples.shape
    half = n // 2
    x = jnp.concatenate(
        [samples[:, :half, :], samples[:, half : 2 * half, :]], axis=0
    )  # (2c, half, d)
    m, n2 = 2 * c, half
    chain_mean = jnp.mean(x, axis=1)  # (m, d)
    chain_var = jnp.var(x, axis=1, ddof=1)  # (m, d)
    w = jnp.mean(chain_var, axis=0)
    b = n2 * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (n2 - 1) / n2 * w + b / n2
    return jnp.sqrt(var_plus / w)


def split_rhat(samples: jax.Array) -> jax.Array:
    """Split-R-hat per parameter for (num_chains, num_samples, dim) samples."""
    samples = _host_layout(jnp.asarray(samples))
    if samples.ndim == 2:
        samples = samples[None]
    return _split_rhat_core(samples)


def _accelerator_resident(samples) -> bool:
    """True iff ``samples`` is a concrete jax.Array living on a non-CPU
    device — the shared predicate for the residency-driven diagnostics
    dispatch (any failure to inspect devices falls back to the host path,
    which is always correct)."""
    if not isinstance(samples, jax.Array) or isinstance(samples, jax.core.Tracer):
        return False
    try:
        return next(iter(samples.devices())).platform != "cpu"
    except Exception:
        return False


@jax.jit
def _device_ess_rhat(samples: jax.Array):
    """(ESS, split-R-hat) per parameter, entirely on-device. One fused
    program; only the two (dim,) result vectors cross the host boundary."""
    return jax.vmap(ess, in_axes=2)(samples), _split_rhat_core(samples)


def ess_and_rhat(samples):
    """(ESS, split-R-hat) per parameter as numpy arrays.

    Dispatch is residency-driven: samples already resident on an
    accelerator are reduced ON DEVICE (`_device_ess_rhat`) and only the
    per-param scalars are fetched — at the r5 bench shape (12288, 3000, 5)
    the old host path pulled the full ~740 MB sample stack through the
    axon tunnel PER CALL, which at ~1 MB/s tunnel bandwidth dominated the
    entire bench wall (~3.5 min/call; 4 calls ~ 14 min of a 21-26 min
    bench, r5 measurement log). Host-resident input keeps the r2-era path:
    the native C++ library when built (~6x over the JAX FFT path on CPU,
    BASELINE.md r2 log), JAX-on-CPU otherwise (VERDICT r2 item 10)."""
    if _accelerator_resident(samples):
        s3 = samples if samples.ndim == 3 else samples[None]
        e, r = _device_ess_rhat(s3)
        return np.asarray(e), np.asarray(r)
    s = np.asarray(samples)
    if s.ndim == 2:
        s = s[None]
    from gptools_tpu.utils import native as _native

    if _native.available():
        return _native.ess_batch(s), _native.split_rhat_batch(s)
    return (
        np.asarray(ess_per_param(jnp.asarray(s))),
        np.asarray(split_rhat(jnp.asarray(s))),
    )


@jax.jit
def _device_moments(samples: jax.Array):
    """Pooled mean/std/quantiles per parameter, on-device; (C, N, D) in,
    five (D,) vectors out."""
    d = samples.shape[-1]
    flat = samples.reshape(-1, d)
    return (
        jnp.mean(flat, axis=0),
        jnp.std(flat, axis=0, ddof=1),
        jnp.quantile(flat, 0.05, axis=0),
        jnp.quantile(flat, 0.50, axis=0),
        jnp.quantile(flat, 0.95, axis=0),
    )


def summarize_samples(
    samples, param_names=None, wall_time: float | None = None
) -> Dict:
    """Posterior summary table (reference
    ``gptools/utils.py :: summarize_sampler``): mean, std, quantiles, ESS,
    R-hat per parameter; ESS/s if wall time is given. Numpy in, dict out;
    accelerator-resident input is reduced entirely on device (moments +
    diagnostics as two jitted programs, only per-param vectors fetched —
    the full-stack host pull cost minutes through the remote-TPU tunnel at
    bench shapes, BASELINE.md r5 compile-wall log)."""
    if _accelerator_resident(samples):
        s3 = samples if samples.ndim == 3 else samples[None]
        c, n, d = s3.shape
        mean, std, q05, q50, q95 = (np.asarray(v) for v in _device_moments(s3))
        ess_v, rhat_v = ess_and_rhat(s3)
    else:
        s = np.asarray(samples)
        if s.ndim == 2:
            s = s[None]
        c, n, d = s.shape
        flat = s.reshape(-1, d)
        mean, std = flat.mean(axis=0), flat.std(axis=0, ddof=1)
        q05, q50, q95 = (np.quantile(flat, q, axis=0) for q in (0.05, 0.50, 0.95))
        # host-side diagnostics go through the native library when it is
        # built (see ess_and_rhat)
        ess_v, rhat_v = ess_and_rhat(s)
    names = (
        list(param_names) if param_names is not None else [f"p{i}" for i in range(d)]
    )
    out = {
        "params": names,
        "mean": mean,
        "std": std,
        "q05": q05,
        "q50": q50,
        "q95": q95,
        "ess": ess_v,
        "rhat": rhat_v,
        "num_chains": c,
        "num_samples": n,
    }
    if wall_time is not None:
        out["wall_time_s"] = float(wall_time)
        out["ess_per_s"] = ess_v / float(wall_time)
    return out


def rank_normalize(samples: jax.Array) -> jax.Array:
    """Rank-normalize draws (Vehtari et al. 2021): map pooled ranks through
    the normal quantile function. Robust to heavy tails; input shape
    (num_chains, num_samples[, dim]), normalized over the pooled sample."""
    s = jnp.asarray(samples)
    shape = s.shape
    flat = s.reshape(-1, *shape[2:]) if s.ndim >= 2 else s
    n = flat.shape[0]
    ranks = jnp.argsort(jnp.argsort(flat, axis=0), axis=0) + 1.0
    u = (ranks - 0.375) / (n + 0.25)  # Blom offset
    z = jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * u - 1.0)
    return z.reshape(shape)


def bulk_ess_per_param(samples: jax.Array) -> jax.Array:
    """Rank-normalized ("bulk") ESS per parameter — the robustness variant
    of `ess_per_param` (Vehtari et al. 2021)."""
    samples = jnp.asarray(samples)
    if samples.ndim == 2:
        samples = samples[None]
    return ess_per_param(rank_normalize(samples))
