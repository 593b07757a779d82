"""Fused Pallas TPU covariance builders for the flagship kernels.

The north star (BASELINE.json) requires covariance-matrix construction —
including derivative cross-covariance blocks — to run as batched Pallas
kernels. The generic XLA path (`gptools_tpu.ops.assemble`) evaluates each
(ni, nj) derivative block as a separate autodiff tower over the full tile and
mask-combines them: correct for ANY kernel, but it re-computes the
exponential / warp for every block. These hand-fused kernels compute the
shared subexpressions ONCE per tile and derive all four {value, slope} blocks
from them in a single VPU pass:

- `se_cov`:    squared exponential, derivative orders {0, 1}, 1-D
- `gibbs_tanh_cov`: Gibbs nonstationary kernel with tanh length-scale warp,
  derivative orders {0, 1}, 1-D — the warp l(x), l'(x) is evaluated once per
  ROW and once per COLUMN (O(N)), not per pair per block (O(N^2) x 4) as in
  the autodiff path.

Derivative formulas (hand-derived, verified against the autodiff path to
f32 resolution in tests/test_pallas.py):

SE, k = s^2 exp(-d^2 / (2 l^2)), d = x - y:
    d/dx k   = -(d / l^2) k
    d/dy k   = +(d / l^2) k
    d2/dxdy k = (1 - d^2/l^2) / l^2 * k

Gibbs, k = s^2 sqrt(2 la lb / S) exp(-d^2/S), S = la^2 + lb^2,
la = l(x), lb = l(y) (reference formula, gptools/kernel/gibbs.py):
    with u = la^2, v = lb^2, u' = 2 la la', v' = 2 lb lb':
    g1 = u' (1/(4u) - 1/(2S) + d^2/S^2) - 2 d / S
    g2 = v' (1/(4v) - 1/(2S) + d^2/S^2) + 2 d / S
    d/dx k = g1 k ;  d/dy k = g2 k
    d2/dxdy k = (g1 g2 + dg2/dx) k,
    dg2/dx = v' (u'/(2 S^2) + 2 d/S^2 - 2 d^2 u'/S^3) + 2/S - 2 d u'/S^2

Batching: the kernels are written un-batched (one hyperparameter vector ->
one (N, N) matrix); ``jax.vmap`` adds the chains axis through Pallas's
batching rule (a leading grid dimension), which is how the evidence path
stays a drop-in replacement under the samplers' per-chain vmap.

Shapes are padded to TPU tiles (8, 128) by the wrappers; callers slice back.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "se_cov",
    "gibbs_tanh_cov",
    "pallas_supported",
    "cov_matrix_flagship",
]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_inputs(X: jax.Array, nid: jax.Array, dtype):
    """Pad point arrays to the f32 tile shape; padded nid = -1 (matches no
    derivative-order mask, so padded entries contribute nothing)."""
    n = X.shape[0]
    n_pad = max(_round_up(n, 128), 128)
    Xp = jnp.zeros((n_pad,), dtype).at[:n].set(X.astype(dtype).reshape(-1))
    nidp = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(nid.astype(jnp.int32))
    return Xp, nidp, n_pad


def _se_pallas_kernel(x_r_ref, x_c_ref, nid_r_ref, nid_c_ref, theta_ref, out_ref):
    from gptools_tpu.ops import fused

    blocks = fused.se_blocks(x_r_ref[:, :], x_c_ref[:, :], theta_ref[0, :])
    out_ref[:, :] = fused.assemble_blocks(
        blocks, nid_r_ref[:, :], nid_c_ref[:, :]
    )


def se_cov(X: jax.Array, nid: jax.Array, theta: jax.Array, interpret: bool = False):
    """(N,) points + (N,) order-ids + (2,) [sigma_f, l] -> (N, N) SE covariance
    with {value, d/dx} blocks. Returns the unpadded matrix."""
    dtype = jnp.float32 if theta.dtype != jnp.float64 else jnp.float64
    n = X.shape[0]
    Xp, nidp, n_pad = _pad_inputs(X.reshape(-1), nid, dtype)
    out = pl.pallas_call(
        _se_pallas_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        Xp.reshape(n_pad, 1),
        Xp.reshape(1, n_pad),
        nidp.reshape(n_pad, 1),
        nidp.reshape(1, n_pad),
        theta.astype(dtype).reshape(1, -1),
    )
    return out[:n, :n]


def _gibbs_pallas_kernel(x_r_ref, x_c_ref, nid_r_ref, nid_c_ref, theta_ref, out_ref):
    from gptools_tpu.ops import fused

    blocks = fused.gibbs_tanh_blocks(x_r_ref[:, :], x_c_ref[:, :], theta_ref[0, :])
    out_ref[:, :] = fused.assemble_blocks(
        blocks, nid_r_ref[:, :], nid_c_ref[:, :]
    )


def gibbs_tanh_cov(
    X: jax.Array, nid: jax.Array, theta: jax.Array, interpret: bool = False
):
    """(N,) points + (N,) order-ids + (5,) [sigma_f, l1, l2, lw, x0] ->
    (N, N) Gibbs-tanh covariance with {value, d/dx} blocks."""
    dtype = jnp.float32 if theta.dtype != jnp.float64 else jnp.float64
    n = X.shape[0]
    Xp, nidp, n_pad = _pad_inputs(X.reshape(-1), nid, dtype)
    out = pl.pallas_call(
        _gibbs_pallas_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        Xp.reshape(n_pad, 1),
        Xp.reshape(1, n_pad),
        nidp.reshape(n_pad, 1),
        nidp.reshape(1, n_pad),
        theta.astype(dtype).reshape(1, -1),
    )
    return out[:n, :n]


# ---------------------------------------------------------------------------
# differentiable wrappers: Pallas forward, fused-XLA-autodiff backward
# ---------------------------------------------------------------------------


def _make_vjp(pallas_fn, fused_fn):
    @jax.custom_vjp
    def cov(X, nid, theta):
        return pallas_fn(X, nid, theta)

    def fwd(X, nid, theta):
        return pallas_fn(X, nid, theta), (X, nid, theta)

    def bwd(res, gK):
        X, nid, theta = res
        _, vjp = jax.vjp(lambda t: fused_fn(X, nid, t), theta)
        (g_theta,) = vjp(gK.astype(theta.dtype))
        return None, None, g_theta

    cov.defvjp(fwd, bwd)
    return cov


from gptools_tpu.ops import fused as _fused  # noqa: E402  (no import cycle:
# fused only imports pallas_cov lazily inside flagship_cov)

se_cov_vjp = _make_vjp(se_cov, _fused.se_cov_fused)
gibbs_tanh_cov_vjp = _make_vjp(gibbs_tanh_cov, _fused.gibbs_tanh_cov_fused)


# ---------------------------------------------------------------------------
# dispatch glue
# ---------------------------------------------------------------------------


def pallas_supported(kernel, data) -> bool:
    """True when (kernel type, data) match a fused Pallas builder: 1-D inputs,
    derivative orders within {(0,), (1,)}."""
    from gptools_tpu.ops.kernels import GibbsKernel, SquaredExponentialKernel, TanhWarp

    if data.num_dim != 1:
        return False
    if not set(data.multi_indices) <= {(0,), (1,)}:
        return False
    if type(kernel) is SquaredExponentialKernel:
        return True
    if isinstance(kernel, GibbsKernel) and type(kernel.warp) is TanhWarp:
        return True
    return False


def cov_matrix_flagship(kernel, theta, data, interpret: bool = False):
    """Fused K_ff for a supported flagship kernel over the dataset's latent
    grid. Derivative-order ids must be 0 for (0,) and 1 for (1,) — guaranteed
    by the DatasetBuilder's sorted multi-index table."""
    from gptools_tpu.ops.kernels import GibbsKernel, SquaredExponentialKernel

    # map dataset order-ids onto the kernel's {0: value, 1: slope} convention
    mi = data.multi_indices
    if mi == ((0,),):
        nid = data.nid  # all zeros
    elif mi == ((0,), (1,)):
        nid = data.nid
    elif mi == ((1,),):
        nid = data.nid + 1
    else:
        raise ValueError(f"unsupported multi-index table {mi}")

    X = data.Xf.reshape(-1)
    if type(kernel) is SquaredExponentialKernel:
        return se_cov(X, nid, theta, interpret=interpret)
    if isinstance(kernel, GibbsKernel):
        return gibbs_tanh_cov(X, nid, theta, interpret=interpret)
    raise ValueError(f"no pallas builder for {type(kernel).__name__}")
