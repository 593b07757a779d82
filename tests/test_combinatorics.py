"""Combinatorics parity utilities (reference ``gptools/utils.py ::
incomplete_bell_poly / generate_set_partitions / fixed_poch``) — including a
Faa di Bruno cross-validation of the JAX autodiff derivative tower, which is
what replaces this machinery in the covariance hot path.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import poch as scipy_poch

from gptools_tpu.utils.combinatorics import (
    fixed_poch,
    generate_set_partition_strings,
    generate_set_partitions,
    incomplete_bell_poly,
)

BELL = [1, 1, 2, 5, 15, 52, 203]


def stirling2(p, q):
    return sum(
        (-1) ** i * math.comb(q, i) * (q - i) ** p for i in range(q + 1)
    ) // math.factorial(q)


def test_bell_poly_stirling_numbers():
    # B_{p,q}(1,...,1) = S(p,q), Stirling second kind.
    for p in range(7):
        for q in range(p + 1):
            got = incomplete_bell_poly(p, q, np.ones(max(p - q + 1, 1)))
            assert got == pytest.approx(stirling2(p, q)), (p, q)


def test_bell_poly_edge_identities():
    x = np.array([2.0, 3.0, 5.0, 7.0, 11.0])
    # B_{p,1}(x) = x_p ; B_{p,p}(x) = x_1^p
    for p in range(1, 5):
        assert incomplete_bell_poly(p, 1, x) == pytest.approx(x[p - 1])
        assert incomplete_bell_poly(p, p, x) == pytest.approx(x[0] ** p)


def test_bell_poly_vectorized_tail_axes():
    x = np.stack([np.ones(4), 2 * np.ones(4), 3 * np.ones(4)])  # (3, 4)
    out = incomplete_bell_poly(3, 2, x)
    # B_{3,2}(x1,x2) = 3 x1 x2 = 3*1*2 = 6 at every tail position
    assert out.shape == (4,)
    np.testing.assert_allclose(out, 6.0)


def test_set_partitions_bell_counts():
    for n in range(6):
        parts = generate_set_partitions(range(n))
        assert len(parts) == BELL[n]
        strings = generate_set_partition_strings(n)
        assert len(strings) == (BELL[n] if n else 0)
    # every partition covers the items exactly once
    for blocks in generate_set_partitions([10, 20, 30, 40]):
        flat = sorted(i for b in blocks for i in b)
        assert flat == [10, 20, 30, 40]
        assert all(b for b in blocks)


def test_fixed_poch_matches_scipy_away_from_poles():
    a = np.array([0.5, 1.7, 3.0, -0.3])
    for n in (0, 1, 2, 5):
        np.testing.assert_allclose(fixed_poch(a, n), scipy_poch(a, n))
    # non-integer n path
    np.testing.assert_allclose(fixed_poch(2.5, 0.5), scipy_poch(2.5, 0.5))


def test_fixed_poch_finite_at_gamma_poles():
    # gamma-ratio form is nan at non-positive-integer a; product form is exact
    assert fixed_poch(-3.0, 2) == pytest.approx(6.0)  # (-3)(-2)
    assert fixed_poch(-2.0, 3) == pytest.approx(0.0)  # hits zero factor
    assert fixed_poch(0.0, 0) == pytest.approx(1.0)
    assert fixed_poch(0.0, 4) == pytest.approx(0.0)


def test_faa_di_bruno_matches_autodiff_tower():
    """d^p/dx^p f(g(x)) = sum_q f^(q)(g) * B_{p,q}(g', g'', ...) — the
    classical expansion the reference assembled by hand must agree with the
    nested-jax.grad tower this rebuild uses instead."""
    f = jnp.exp
    g = jnp.sin
    x0 = 0.7

    def tower(fn, order, x):
        h = fn
        vals = [float(h(x))]
        for _ in range(order):
            h = jax.grad(h)
            vals.append(float(h(x)))
        return vals  # [fn(x), fn'(x), ..., fn^(order)(x)]

    P = 5
    comp = lambda x: f(g(x))
    lhs = tower(comp, P, x0)
    g_derivs = tower(g, P, x0)[1:]  # g', g'', ...
    f_derivs = tower(f, P, float(g(x0)))  # f(g), f'(g), ...
    for p in range(1, P + 1):
        rhs = sum(
            f_derivs[q] * incomplete_bell_poly(p, q, np.array(g_derivs))
            for q in range(1, p + 1)
        )
        assert lhs[p] == pytest.approx(rhs, rel=1e-6), p
