"""Native diagnostics library vs the JAX reference implementation."""

import numpy as np
import pytest

from gptools_tpu.utils import native
from gptools_tpu.utils.diagnostics import ess_per_param, split_rhat


@pytest.fixture(scope="module")
def lib():
    handle = native.load(auto_build=True)
    if handle is None:
        pytest.skip("native library could not be built")
    return handle


def _ar1_chains(rng, c=4, s=400, d=3, phi=0.7):
    out = np.empty((c, s, d))
    for ci in range(c):
        for di in range(d):
            x = np.empty(s)
            x[0] = rng.standard_normal()
            for t in range(1, s):
                x[t] = phi * x[t - 1] + np.sqrt(1 - phi**2) * rng.standard_normal()
            out[ci, :, di] = x * (di + 1)
    return out


def test_native_ess_matches_jax(lib, rng):
    chains = _ar1_chains(rng)
    got = native.ess_batch(chains)
    want = np.asarray(ess_per_param(chains))
    np.testing.assert_allclose(got, want, rtol=1e-8)
    # sanity: AR(1) with phi=0.7 has tau ~ (1+phi)/(1-phi) ~ 5.7
    n_tot = chains.shape[0] * chains.shape[1]
    assert 0.05 * n_tot < got[0] < 0.5 * n_tot


def test_native_rhat_matches_jax(lib, rng):
    chains = _ar1_chains(rng)
    got = native.split_rhat_batch(chains)
    want = np.asarray(split_rhat(chains))
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # shifted chain -> rhat far from 1
    bad = chains.copy()
    bad[0, :, 0] += 10.0
    got_bad = native.split_rhat_batch(bad)
    assert got_bad[0] > 2.0


def test_fallback_without_library(monkeypatch, rng):
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_SEARCHED", True)
    monkeypatch.setenv("GPTOOLS_NATIVE_LIB", "/nonexistent/lib.so")
    chains = _ar1_chains(rng, c=2, s=100, d=2)
    got = native.ess_batch(chains)
    want = np.asarray(ess_per_param(chains))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_matches_jax_with_stuck_chain(lib, rng):
    chains = _ar1_chains(rng, c=4, s=200, d=2)
    chains[1] = 0.37  # stuck
    got = native.ess_batch(chains)
    want = np.asarray(ess_per_param(chains))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_native_ess_budget_fallback_matches_jax():
    """Long-memory chains exhaust the native Geyer budget; the wrapper must
    recompute those params through the JAX FFT path and agree exactly."""
    import numpy as np

    from gptools_tpu.utils import native
    from gptools_tpu.utils.diagnostics import ess_per_param

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(1)
    e = rng.standard_normal((64, 400, 3))
    s = np.empty_like(e)
    s[:, 0] = e[:, 0]
    for t in range(1, 400):
        s[:, t] = 0.95 * s[:, t - 1] + np.sqrt(1 - 0.95**2) * e[:, t]
    got = native.ess_batch(s, max_pairs=4)  # tiny budget: force the fallback
    want = np.asarray(ess_per_param(s))
    np.testing.assert_allclose(got, want, rtol=1e-6)
