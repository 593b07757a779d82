"""Kernel-zoo correctness: values vs closed forms, derivative blocks vs
finite differences (the oracle strategy prescribed in SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptools_tpu.ops import kernels as K
from gptools_tpu.ops.derivs import kernel_block_fn


def fd_block(scalar, x1, x2, theta, a, b, h=1e-5):
    """Finite-difference mixed partial d^a_x1 d^b_x2 k (central, nested)."""

    def f(x1v, x2v):
        return float(scalar(jnp.asarray(x1v), jnp.asarray(x2v), jnp.asarray(theta)))

    def diff(fun, idx, which):
        def d(x1v, x2v):
            e = np.zeros_like(x1v if which == 0 else x2v)
            e[idx] = h
            if which == 0:
                return (fun(x1v + e, x2v) - fun(x1v - e, x2v)) / (2 * h)
            return (fun(x1v, x2v + e) - fun(x1v, x2v - e)) / (2 * h)

        return d

    fun = f
    for d_, order in enumerate(a):
        for _ in range(order):
            fun = diff(fun, d_, 0)
    for d_, order in enumerate(b):
        for _ in range(order):
            fun = diff(fun, d_, 1)
    return fun(np.asarray(x1, float), np.asarray(x2, float))


SE = K.SquaredExponentialKernel(num_dim=1)
SE2 = K.SquaredExponentialKernel(num_dim=2)
M52 = K.Matern52Kernel(num_dim=1)
M32 = K.MaternKernel(nu=1.5, num_dim=1)
RQ = K.RationalQuadraticKernel(num_dim=1)
GIBBS = K.GibbsKernel1dTanh()


def test_se_value_closed_form():
    theta = jnp.array([2.0, 0.7])
    x1 = jnp.array([0.3])
    x2 = jnp.array([1.1])
    got = SE.smooth_scalar(x1, x2, theta)
    want = 4.0 * np.exp(-0.5 * (0.8 / 0.7) ** 2)
    assert np.isclose(float(got), want, rtol=1e-12)


def test_se_derivative_closed_forms():
    """SE derivative blocks vs the Hermite-polynomial closed forms the
    reference hard-coded (gptools/kernel/squared_exponential.py):
    d/dx1 k = -(x1-x2)/l^2 k ; d2/dx1 dx2 k = (1 - (x1-x2)^2/l^2) k / l^2."""
    sf, l = 1.7, 0.6
    theta = jnp.array([sf, l])
    x1 = jnp.array([0.2])
    x2 = jnp.array([0.9])
    d = 0.2 - 0.9
    k0 = sf**2 * np.exp(-0.5 * d**2 / l**2)
    d10 = kernel_block_fn(SE.smooth_scalar, (1,), (0,))(x1, x2, theta)
    assert np.isclose(float(d10), -d / l**2 * k0, rtol=1e-10)
    d11 = kernel_block_fn(SE.smooth_scalar, (1,), (1,))(x1, x2, theta)
    assert np.isclose(float(d11), (1 - d**2 / l**2) * k0 / l**2, rtol=1e-10)
    # second-order: d2/dx1^2 k = (d^2/l^2 - 1) k / l^2
    d20 = kernel_block_fn(SE.smooth_scalar, (2,), (0,))(x1, x2, theta)
    assert np.isclose(float(d20), (d**2 / l**2 - 1) * k0 / l**2, rtol=1e-10)


@pytest.mark.parametrize(
    "kern,theta",
    [
        (SE, [1.3, 0.8]),
        (M52, [1.1, 0.9]),
        (RQ, [1.2, 1.7, 0.8]),
        (GIBBS, [1.5, 0.4, 0.1, 0.2, 0.6]),
    ],
)
@pytest.mark.parametrize("ab", [((0,), (0,)), ((1,), (0,)), ((0,), (1,)), ((1,), (1,)), ((2,), (1,))])
def test_deriv_blocks_match_finite_differences(kern, theta, ab):
    a, b = ab
    theta = jnp.asarray(theta, jnp.float64)
    x1 = jnp.array([0.31], jnp.float64)
    x2 = jnp.array([0.74], jnp.float64)
    got = float(kern.block_fn(a, b)(x1, x2, theta))
    order = sum(a) + sum(b)
    h = 1e-5 if order <= 2 else 1e-3
    want = fd_block(kern.smooth_scalar, x1, x2, theta, a, b, h=h)
    rtol = 2e-4 if order <= 2 else 2e-3
    assert np.isclose(got, want, rtol=rtol, atol=5e-6), (got, want)


def test_se2d_ard_mixed_dims_fd():
    theta = jnp.array([1.4, 0.8, 1.3])
    x1 = jnp.array([0.3, -0.2])
    x2 = jnp.array([0.6, 0.5])
    a, b = (1, 0), (0, 1)
    got = float(SE2.block_fn(a, b)(x1, x2, theta))
    want = fd_block(SE2.smooth_scalar, x1, x2, theta, a, b)
    assert np.isclose(got, want, rtol=1e-5)


def test_matern_value_matches_scipy():
    from scipy.special import kv, gamma

    for nu, kern in [(1.5, M32), (2.5, M52)]:
        sf, l = 1.3, 0.7
        theta = jnp.array([sf, l])
        for dist in [0.05, 0.4, 2.3]:
            x1 = jnp.array([0.0])
            x2 = jnp.array([dist])
            got = float(kern.smooth_scalar(x1, x2, theta))
            s = np.sqrt(2 * nu) * dist / l
            want = sf**2 * (2 ** (1 - nu) / gamma(nu)) * s**nu * kv(nu, s)
            assert np.isclose(got, want, rtol=1e-9), (nu, dist)


def test_matern_coincident_derivatives_finite_and_correct():
    """(1,1) block at x1 == x2 must equal 2*nu/((2*nu-2) l^2) * sigma^2
    (= -k''(0), the derivative-process variance)."""
    sf, l = 1.2, 0.8
    theta = jnp.array([sf, l])
    x = jnp.array([0.4])
    for nu, kern in [(2.5, M52)]:
        got = float(kern.block_fn((1,), (1,))(x, x, theta))
        want = sf**2 * nu / (nu - 1.0) / l**2  # -k''(0) for Matern
        assert np.isfinite(got)
        assert np.isclose(got, want, rtol=1e-8), (got, want)
    # value at coincidence is sigma_f^2
    assert np.isclose(float(M52.smooth_scalar(x, x, theta)), sf**2, rtol=1e-12)


def test_gibbs_value_closed_form():
    sf, l1, l2, lw, x0 = 1.5, 0.4, 0.1, 0.2, 0.6
    theta = jnp.array([sf, l1, l2, lw, x0])

    def lx(x):
        return l1 + 0.5 * (l2 - l1) * (1 + np.tanh((x - x0) / lw))

    xa, xb = 0.3, 0.8
    la, lb = lx(xa), lx(xb)
    want = (
        sf**2
        * np.sqrt(2 * la * lb / (la**2 + lb**2))
        * np.exp(-((xa - xb) ** 2) / (la**2 + lb**2))
    )
    got = float(GIBBS.smooth_scalar(jnp.array([xa]), jnp.array([xb]), theta))
    assert np.isclose(got, want, rtol=1e-12)


def test_kernel_algebra_sum_product():
    ksum = SE + M52
    kprod = SE * M52
    theta = jnp.array([1.3, 0.8, 1.1, 0.9])
    x1 = jnp.array([0.2])
    x2 = jnp.array([0.5])
    vs = float(SE.smooth_scalar(x1, x2, theta[:2]))
    vm = float(M52.smooth_scalar(x1, x2, theta[2:]))
    assert np.isclose(float(ksum.smooth_scalar(x1, x2, theta)), vs + vm)
    assert np.isclose(float(kprod.smooth_scalar(x1, x2, theta)), vs * vm)
    # product-rule derivative via autodiff == finite differences
    got = float(kprod.block_fn((1,), (1,))(x1, x2, theta))
    want = fd_block(kprod.smooth_scalar, x1, x2, theta, (1,), (1,))
    assert np.isclose(got, want, rtol=1e-5)
    assert ksum.num_params == 4
    # scaling
    k2 = 2.5 * SE
    assert np.isclose(float(k2.smooth_scalar(x1, x2, theta[:2])), 2.5 * vs)


def test_masked_kernel_inactive_dims_zero_derivative():
    km = K.MaskedKernel(SE, total_dim=2, active_dims=[0])
    theta = jnp.array([1.3, 0.8])
    x1 = jnp.array([0.2, 5.0])
    x2 = jnp.array([0.5, -3.0])
    # value only depends on dim 0
    v = float(km.smooth_scalar(x1, x2, theta))
    assert np.isclose(v, float(SE.smooth_scalar(x1[:1], x2[:1], theta)))
    # derivative w.r.t. dim 1 is exactly zero
    d = float(km.block_fn((0, 1), (0, 0))(x1, x2, theta))
    assert d == 0.0


def test_warped_kernel_chain_rule():
    warp = K.LinearWarp(0.0, 2.0)
    kw = K.WarpedKernel(SE, warp)
    theta = jnp.array([1.3, 0.8])
    x1 = jnp.array([0.2])
    x2 = jnp.array([0.5])
    want = float(SE.smooth_scalar(x1 / 2.0, x2 / 2.0, theta))
    assert np.isclose(float(kw.smooth_scalar(x1, x2, theta)), want)
    # chain rule: d/dx1 k(w(x1), w(x2)) = (1/2) * k'(...)
    d = float(kw.block_fn((1,), (0,))(x1, x2, theta))
    d_base = float(SE.block_fn((1,), (0,))(x1 / 2.0, x2 / 2.0, theta))
    assert np.isclose(d, 0.5 * d_base, rtol=1e-10)


def test_interpolated_warp_values_and_smoothness():
    w = K.InterpolatedWarp([0.0, 0.5, 1.0])
    theta = jnp.array([0.3, 0.6, 0.2])
    # hits knot values exactly
    for x, v in [(0.0, 0.3), (0.5, 0.6), (1.0, 0.2)]:
        assert np.isclose(float(w(jnp.asarray(x), theta)), v, atol=1e-12)
    # differentiable in between
    g = jax.grad(lambda x: w(x, theta))(jnp.asarray(0.25))
    assert np.isfinite(float(g))


def test_arbitrary_kernel_autodiff():
    fn = lambda x1, x2, th: th[0] * jnp.exp(-jnp.sum((x1 - x2) ** 2) / th[1])
    ka = K.ArbitraryKernel(fn, num_dim=1, param_names=("amp", "s"))
    theta = jnp.array([2.0, 0.5])
    x1 = jnp.array([0.1])
    x2 = jnp.array([0.4])
    got = float(ka.block_fn((1,), (1,))(x1, x2, theta))
    want = fd_block(ka.smooth_scalar, x1, x2, theta, (1,), (1,))
    assert np.isclose(got, want, rtol=1e-5)


def test_matern_general_free_nu():
    """Free-nu Matern matches scipy closed form and has finite nu-gradient."""
    from scipy.special import kv, gamma

    kg = K.MaternGeneralKernel()
    sf, nu, l = 1.2, 1.8, 0.6
    theta = jnp.array([sf, nu, l])
    x1 = jnp.array([0.1])
    x2 = jnp.array([0.8])
    got = float(kg.smooth_scalar(x1, x2, theta))
    s = np.sqrt(2 * nu) * 0.7 / l
    want = sf**2 * 2 ** (1 - nu) / gamma(nu) * s**nu * kv(nu, s)
    assert np.isclose(got, want, rtol=1e-6)
    # value at coincidence -> sigma^2
    assert np.isclose(float(kg.smooth_scalar(x1, x1, theta)), sf**2, rtol=1e-5)
    # gradient w.r.t. nu vs finite differences
    g = jax.grad(lambda t: kg.smooth_scalar(x1, x2, t))(theta)
    h = 1e-5
    fd = (
        float(kg.smooth_scalar(x1, x2, theta.at[1].add(h)))
        - float(kg.smooth_scalar(x1, x2, theta.at[1].add(-h)))
    ) / (2 * h)
    assert np.isclose(float(g[1]), fd, rtol=1e-4)
    # half-integer consistency: nu=2.5 equals Matern52
    t52 = jnp.array([sf, 2.5, l])
    v1 = float(kg.smooth_scalar(x1, x2, t52))
    v2 = float(M52.smooth_scalar(x1, x2, jnp.array([sf, l])))
    assert np.isclose(v1, v2, rtol=1e-7)


def test_chain_rule_kernel_matches_se():
    """ChainRuleKernel(outer, inner) == SE when outer=exp, inner=-r^2/2l^2 —
    values AND autodiff derivative blocks (the reference assembled these with
    Faa di Bruno; here the chain rule is free)."""
    outer = lambda u, th: th[0] ** 2 * jnp.exp(u)
    inner = lambda x1, x2, th: -jnp.sum((x1 - x2) ** 2) / (2 * th[1] ** 2)
    kc = K.ChainRuleKernel(outer, inner, num_dim=1, param_names=("sf", "l"))
    kse = K.SquaredExponentialKernel()
    theta = jnp.array([1.3, 0.7])
    x1 = jnp.array([0.2])
    x2 = jnp.array([0.9])
    for ni, nj in [((0,), (0,)), ((1,), (0,)), ((1,), (1,)), ((2,), (1,))]:
        got = float(kc.block_fn(ni, nj)(x1, x2, theta))
        want = float(kse.block_fn(ni, nj)(x1, x2, theta))
        assert np.isclose(got, want, rtol=1e-6), (ni, nj)
