"""Mixed partial derivatives of scalar kernel/mean functions via JAX autodiff.

This module replaces, wholesale, the reference's entire analytic-derivative
apparatus:

- Hermite-polynomial closed forms for the squared-exponential
  (``gptools/kernel/squared_exponential.py :: SquaredExponentialKernel``),
- the Faa-di-Bruno / incomplete-Bell-polynomial chain-rule machinery
  (``gptools/kernel/core.py :: ChainRuleKernel``,
  ``gptools/utils.py :: incomplete_bell_poly, generate_set_partitions``),
- and the mpmath arbitrary-precision numerical differentiation fallback
  (``gptools/kernel/core.py :: ArbitraryKernel``).

A covariance between an observation of derivative multi-index ``a`` (per input
dimension) at ``x1`` and one of multi-index ``b`` at ``x2`` is

    cov = d^|a|/dx1^a d^|b|/dx2^b k(x1, x2)

We obtain these *exactly* (to machine precision) by composing forward-mode
directional derivatives (``jax.jvp`` with basis tangents), which XLA then
fuses into one elementwise kernel over the covariance tile. Forward mode is
the right tool: the functions are scalar->scalar in each differentiation
variable, derivative orders are small (0-2 in all reference use-cases), and
jvp towers avoid the transpose passes reverse mode would add.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "MultiIndex",
    "normalize_multi_index",
    "directional_derivative",
    "mixed_partial",
    "kernel_block_fn",
    "mean_block_fn",
]

# A per-dimension derivative order, e.g. (1, 0) = d/dx_0 in 2 input dims.
MultiIndex = Tuple[int, ...]


def normalize_multi_index(n, num_dim: int) -> MultiIndex:
    """Canonicalize user-facing derivative-order input to a multi-index tuple.

    The reference (``gptools/core.py :: add_data`` ``n=`` argument) accepts a
    scalar total order for 1-D problems or a per-dimension array. We accept:
    ``int`` (1-D: order n in the single dimension; multi-D: only 0 allowed
    unless num_dim == 1), or a length-``num_dim`` sequence of ints.
    """
    if isinstance(n, (int,)):
        if n < 0:
            raise ValueError("derivative order must be >= 0")
        if num_dim == 1:
            return (int(n),)
        if n == 0:
            return (0,) * num_dim
        raise ValueError(
            "scalar derivative order > 0 is ambiguous for num_dim > 1; "
            "pass a per-dimension multi-index"
        )
    t = tuple(int(v) for v in n)
    if len(t) != num_dim:
        raise ValueError(f"multi-index length {len(t)} != num_dim {num_dim}")
    if any(v < 0 for v in t):
        raise ValueError("derivative orders must be >= 0")
    return t


def directional_derivative(fn: Callable, argnum: int, dim: int) -> Callable:
    """d fn / d args[argnum][dim], as a new function with the same signature.

    Implemented with ``jax.jvp`` and a one-hot tangent, so repeated
    application builds a forward-mode derivative tower.
    """

    def dfn(*args):
        tangents = tuple(
            jnp.zeros_like(a)
            if i != argnum
            else jnp.zeros_like(a).at[dim].set(1.0)
            for i, a in enumerate(args)
        )
        return jax.jvp(fn, args, tangents)[1]

    return dfn


def mixed_partial(fn: Callable, orders: Sequence[MultiIndex]) -> Callable:
    """Apply multi-index partial derivatives to several array arguments.

    ``orders[i]`` is the derivative multi-index taken w.r.t. positional
    argument ``i`` of ``fn`` (later arguments, e.g. the hyperparameter vector,
    get no derivative by omission).
    """
    out = fn
    for argnum, mi in enumerate(orders):
        for dim, order in enumerate(mi):
            for _ in range(order):
                out = directional_derivative(out, argnum, dim)
    return out


@functools.lru_cache(maxsize=None)
def _block_cached(scalar_fn, orders: Tuple[MultiIndex, ...]):
    return mixed_partial(scalar_fn, orders)


def _block(scalar_fn: Callable, orders: Tuple[MultiIndex, ...]) -> Callable:
    try:
        return _block_cached(scalar_fn, orders)
    except TypeError:  # unhashable function object — skip the cache
        return mixed_partial(scalar_fn, orders)


def kernel_block_fn(scalar_fn: Callable, a: MultiIndex, b: MultiIndex) -> Callable:
    """``(x1, x2, theta) -> d^a_x1 d^b_x2 k(x1, x2, theta)`` (scalar).

    Replaces the ``(ni, nj)`` branch of the reference kernel protocol
    ``gptools/kernel/core.py :: Kernel.__call__(Xi, Xj, ni, nj)``.
    Cached per (function, a, b) so each block traces once.
    """
    return _block(scalar_fn, (tuple(a), tuple(b)))


def mean_block_fn(scalar_fn: Callable, a: MultiIndex) -> Callable:
    """``(x, theta) -> d^a_x m(x, theta)`` for mean functions
    (reference: ``gptools/mean.py :: MeanFunction.__call__(X, n)``)."""
    return _block(scalar_fn, (tuple(a),))
