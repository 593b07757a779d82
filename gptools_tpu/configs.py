"""Typed configurations for the five BASELINE.json benchmark setups.

The reference has no config system — everything is constructor kwargs and a
global numpy seed (SURVEY.md section 5, config row). Here each baseline
config is a frozen dataclass that builds (model, dataset, synthetic ground
truth) reproducibly from an explicit PRNG seed, so benchmarks, tests and the
parity harness all construct the identical problem.

Configs (BASELINE.json :: configs):
  1. 1-D SE-kernel GP regression, MAP fit (synthetic)
  2. SE GP with derivative observations; single-chain NUTS
  3. Matern-5/2 GP with mean function + input warping; multi-chain HMC
  4. Gibbs tanh kernel profile fit with edge derivative constraints; SMC
  5. Multi-host: 1024 sharded chains on a tokamak-style ne/Te profile fit
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np

__all__ = [
    "BaselineProblem",
    "config1_se_map",
    "config2_se_deriv_nuts",
    "config3_matern_mean_warp_hmc",
    "config4_gibbs_smc",
    "config5_multihost_profile",
    "ALL_CONFIGS",
]


@dataclasses.dataclass(frozen=True)
class BaselineProblem:
    """A fully-specified inference problem: model + data + recommended
    inference settings."""

    name: str
    description: str
    model: object            # GPModel
    data: object             # Dataset
    sampler: Optional[str]   # None => MAP only
    sampler_kwargs: dict
    truth: dict              # synthetic ground-truth quantities


def _mk(seed):
    return np.random.default_rng(seed)


def config1_se_map(seed: int = 0, n_points: int = 40) -> BaselineProblem:
    """1-D SE GP regression, MAP hyperparameter fit (BASELINE config 1)."""
    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.ops.kernels import SquaredExponentialKernel
    from gptools_tpu.utils.priors import LogNormalJointPrior

    rng = _mk(seed)
    X = np.linspace(0, 3, n_points)
    f = np.sin(2.0 * X)
    err = 0.1
    y = f + err * rng.standard_normal(n_points)
    b = DatasetBuilder(1)
    b.add(X, y, err_y=err)
    model = GPModel(
        SquaredExponentialKernel(
            hyperprior=LogNormalJointPrior([0.0, -0.7], [1.0, 1.0])
        )
    )
    return BaselineProblem(
        name="config1_se_map",
        description="1D SE-kernel GP regression, MAP fit",
        model=model,
        data=b.build(),
        sampler=None,
        sampler_kwargs=dict(random_starts=8),
        truth=dict(f=f, X=X, err=err),
    )


def config2_se_deriv_nuts(seed: int = 0, n_points: int = 30) -> BaselineProblem:
    """SE GP with derivative (slope-constraint) observations; NUTS
    (BASELINE config 2)."""
    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.ops.kernels import SquaredExponentialKernel
    from gptools_tpu.utils.priors import LogNormalJointPrior

    rng = _mk(seed)
    X = np.linspace(0, 3, n_points)
    f = np.sin(1.5 * X)
    err = 0.1
    y = f + err * rng.standard_normal(n_points)
    b = DatasetBuilder(1)
    b.add(X, y, err_y=err)
    # exact slope constraints at both ends (reference's canonical example:
    # docs sine-wave demo with an edge derivative constraint)
    b.add(np.array([0.0]), np.array([1.5]), err_y=0.05, n=1)
    b.add(np.array([3.0]), np.array([1.5 * np.cos(4.5)]), err_y=0.05, n=1)
    model = GPModel(
        SquaredExponentialKernel(
            hyperprior=LogNormalJointPrior([0.0, -0.5], [0.75, 0.75])
        )
    )
    return BaselineProblem(
        name="config2_se_deriv_nuts",
        description="SE GP with derivative observations; NUTS",
        model=model,
        data=b.build(),
        sampler="nuts",
        sampler_kwargs=dict(num_chains=8, num_warmup=500, num_samples=1000),
        truth=dict(f=f, X=X, err=err),
    )


def config3_matern_mean_warp_hmc(seed: int = 0, n_points: int = 35) -> BaselineProblem:
    """Matern-5/2 GP + linear mean + beta-CDF input warping; multi-chain HMC
    (BASELINE config 3)."""
    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.models.mean import LinearMeanFunction
    from gptools_tpu.ops.kernels import BetaWarp, Matern52Kernel, WarpedKernel
    from gptools_tpu.utils.priors import (
        LogNormalJointPrior,
        NormalJointPrior,
        UniformJointPrior,
    )

    rng = _mk(seed)
    X = np.linspace(0.02, 0.98, n_points)
    # trend + wiggle, denser structure near the right edge
    f = 0.8 * X + 0.3 * np.sin(8.0 * X**2)
    err = 0.05
    y = f + err * rng.standard_normal(n_points)
    b = DatasetBuilder(1)
    b.add(X, y, err_y=err)
    kern = WarpedKernel(
        Matern52Kernel(hyperprior=LogNormalJointPrior([0.0, -1.0], [0.75, 0.75])),
        BetaWarp(),
        hyperprior=LogNormalJointPrior([0.0, -1.0], [0.75, 0.75])
        * UniformJointPrior([0.3, 0.3], [3.0, 3.0]),
    )
    mean = LinearMeanFunction(
        hyperprior=NormalJointPrior([0.0, 0.0], [2.0, 2.0])
    )
    model = GPModel(kern, mean=mean)
    return BaselineProblem(
        name="config3_matern_mean_warp_hmc",
        description="Matern-5/2 + mean function + input warping; multi-chain HMC",
        model=model,
        data=b.build(),
        sampler="hmc",
        sampler_kwargs=dict(num_chains=16, num_warmup=500, num_samples=800),
        truth=dict(f=f, X=X, err=err),
    )


def _pedestal_profile(x, x0=0.9, lam=0.05):
    prof = 1.0 - 0.5 * np.minimum(x, x0) ** 2
    edge = x > x0
    prof = np.where(edge, (1.0 - 0.5 * x0**2) * np.exp(-(x - x0) / lam), prof)
    return prof


def config4_gibbs_smc(seed: int = 0, n_points: int = 25) -> BaselineProblem:
    """Gibbs tanh-warp kernel profile fit with edge derivative constraints;
    SMC over hyperparameters (BASELINE config 4 — the flagship)."""
    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.ops.kernels import GibbsKernel1dTanh
    from gptools_tpu.utils.priors import LogNormalJointPrior, UniformJointPrior

    rng = _mk(seed)
    x = np.linspace(0.0, 1.2, n_points)
    prof = _pedestal_profile(x)
    err = 0.03
    y = prof + err * rng.standard_normal(n_points)
    b = DatasetBuilder(1)
    b.add(x, y, err_y=err)
    b.add(np.array([0.0]), np.array([0.0]), err_y=0.01, n=1)
    b.add(np.array([1.2]), np.array([0.0]), err_y=0.05, n=1)
    prior = (
        LogNormalJointPrior([0.0], [0.75])
        * LogNormalJointPrior([-1.0], [0.6])
        * LogNormalJointPrior([-2.3], [0.6])
        * LogNormalJointPrior([-2.3], [0.6])
        * UniformJointPrior([0.6], [1.1])
    )
    model = GPModel(GibbsKernel1dTanh(hyperprior=prior))
    return BaselineProblem(
        name="config4_gibbs_smc",
        description="Gibbs tanh kernel profile fit with edge derivative "
        "constraints; SMC",
        model=model,
        data=b.build(),
        sampler="smc",
        sampler_kwargs=dict(num_particles=2048, num_mutations=8),
        truth=dict(profile=prof, X=x, err=err),
    )


def config5_multihost_profile(seed: int = 0, n_points: int = 30) -> BaselineProblem:
    """Tokamak-style ne/Te profile fit for 1024 mesh-sharded chains with
    collective step-size adaptation (BASELINE config 5). Same model family as
    config 4 with line-integrated (transformed) observations added; run it
    through `gptools_tpu.parallel.sharded_sample` or the
    `infer.pipeline.smc_then_nuts` pipeline on a mesh."""
    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.ops.kernels import GibbsKernel1dTanh
    from gptools_tpu.utils.priors import LogNormalJointPrior, UniformJointPrior

    rng = _mk(seed)
    x = np.linspace(0.0, 1.2, n_points)
    prof = _pedestal_profile(x)
    err = 0.03
    y = prof + err * rng.standard_normal(n_points)
    b = DatasetBuilder(1)
    b.add(x, y, err_y=err)
    b.add(np.array([0.0]), np.array([0.0]), err_y=0.01, n=1)
    # line-integrated observation over the chord (quadrature weights), the
    # reference's T-matrix use-case (gptools add_data(..., T=...))
    xq = np.linspace(0.0, 1.2, 16)
    w = np.full(16, 1.2 / 16)
    true_integral = np.trapezoid(_pedestal_profile(xq), xq)
    b.add(xq, y=[true_integral + 0.02 * rng.standard_normal()], T=w[None, :], err_y=0.02)
    prior = (
        LogNormalJointPrior([0.0], [0.75])
        * LogNormalJointPrior([-1.0], [0.6])
        * LogNormalJointPrior([-2.3], [0.6])
        * LogNormalJointPrior([-2.3], [0.6])
        * UniformJointPrior([0.6], [1.1])
    )
    model = GPModel(GibbsKernel1dTanh(hyperprior=prior))
    return BaselineProblem(
        name="config5_multihost_profile",
        description="1024 sharded chains on tokamak-style profile fit with a "
        "line-integral observation; collective adaptation",
        model=model,
        data=b.build(),
        sampler="smc+chees",
        sampler_kwargs=dict(num_chains=1024, num_warmup=100, num_samples=300),
        truth=dict(profile=prof, X=x, err=err, integral=true_integral),
    )


ALL_CONFIGS = {
    1: config1_se_map,
    2: config2_se_deriv_nuts,
    3: config3_matern_mean_warp_hmc,
    4: config4_gibbs_smc,
    5: config5_multihost_profile,
}
