"""TPU smoke test: fused-XLA vs Pallas covariance backends on real hardware.

Runs the flagship Gibbs evidence with cov_backend='fused' and 'pallas' and
asserts equal results (and reports per-call timing). CPU fallback uses
Pallas interpret mode via the tests instead; this script is for the chip.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import _flagship_problem
    from gptools_tpu.models.gp import GPModel

    model_f, data = _flagship_problem()
    model_p = GPModel(model_f.kernel, cov_backend="pallas")
    model_g = GPModel(model_f.kernel, cov_backend="generic")
    theta = jnp.asarray(model_f.initial_params, jnp.float32)
    data32 = data.astype(jnp.float32)

    lls = {}
    for name, m in [("fused", model_f), ("pallas", model_p), ("generic", model_g)]:
        f = jax.jit(lambda t, _m=m: _m.log_marginal(t, data32))
        ll = float(f(theta))
        t0 = time.perf_counter()
        for _ in range(50):
            f(theta).block_until_ready()
        dt = (time.perf_counter() - t0) / 50
        # gradient path too
        g = jax.jit(jax.grad(lambda t, _m=m: _m.log_marginal(t, data32)))
        gv = np.asarray(g(theta))
        lls[name] = (ll, dt, gv)
        print(f"{name:>8s}: ll={ll:.6f}  {dt*1e3:.2f} ms/call  grad[0]={gv[0]:.6f}")

    assert abs(lls["fused"][0] - lls["pallas"][0]) < 1e-3, "pallas != fused"
    assert abs(lls["fused"][0] - lls["generic"][0]) < 1e-3, "generic != fused"
    np.testing.assert_allclose(lls["pallas"][2], lls["fused"][2], rtol=1e-3)
    print("OK: all covariance backends agree on", jax.devices()[0])


if __name__ == "__main__":
    main()
