"""TPU smoke test: fused-XLA vs Pallas covariance backends on real hardware.

VERDICT r2 item 7: compiled-mode (non-interpret) Pallas correctness evidence.
Three parts, each printing one JSON line:

1. backends: flagship Gibbs evidence + gradient with cov_backend
   'fused'/'pallas'/'generic' agree at the bench shape (N=27).
2. kernels: compiled se_cov / gibbs_tanh_cov pinned against the fused-XLA
   builders at N=27 AND N=512 (multiple grid tiles) on the chip.
3. pallas-grad-hazard: the single-shot (non-scan-chained) jit of the
   12288-chain pallas-backend evidence gradient — the configuration that
   OOMed in round 2 (20.5 GB of HLO pad temps). Run LAST; pass
   --skip-hazard to omit it.

CPU fallback uses Pallas interpret mode via the tests instead; this script
is for the chip.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def check_backends():
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
        g = jax.jit(jax.grad(lambda t, _m=m: _m.log_marginal(t, data32)))
        gv = np.asarray(g(theta))
        lls[name] = (ll, dt, gv)
        print(
            f"{name:>8s}: ll={ll:.6f}  {dt*1e3:.2f} ms/call  grad[0]={gv[0]:.6f}",
            file=sys.stderr,
        )

    assert abs(lls["fused"][0] - lls["pallas"][0]) < 1e-3, "pallas != fused"
    assert abs(lls["fused"][0] - lls["generic"][0]) < 1e-3, "generic != fused"
    np.testing.assert_allclose(lls["pallas"][2], lls["fused"][2], rtol=1e-3)
    print(json.dumps({"check": "backends", "ok": True,
                      "ll": {k: v[0] for k, v in lls.items()}}))


def check_compiled_kernels():
    """Compiled (non-interpret) Pallas builders vs fused-XLA at N=27 and
    N=512 — the latter exercises the (row, col) grid tiling."""
    from gptools_tpu.ops import fused, pallas_cov

    rng = np.random.default_rng(0)
    out = {}
    for n in (27, 512):
        X = jnp.asarray(np.sort(rng.uniform(0, 1.2, n)), jnp.float32)
        nid = jnp.asarray((np.arange(n) % 3 == 0).astype(np.int32))
        for kname, pfn, ffn, theta in [
            ("se", pallas_cov.se_cov, fused.se_cov_fused,
             jnp.asarray([1.3, 0.4], jnp.float32)),
            ("gibbs", pallas_cov.gibbs_tanh_cov, fused.gibbs_tanh_cov_fused,
             jnp.asarray([1.5, 0.4, 0.08, 0.1, 0.9], jnp.float32)),
        ]:
            Kp = np.asarray(jax.jit(lambda X_, n_, t_: pfn(X_, n_, t_))(X, nid, theta))
            Kf = np.asarray(jax.jit(ffn)(X, nid, theta))
            err = float(np.max(np.abs(Kp - Kf)) / (np.max(np.abs(Kf)) + 1e-30))
            assert err < 1e-6, (kname, n, err)
            out[f"{kname}_N{n}_relerr"] = err
    print(json.dumps({"check": "compiled_kernels", "ok": True, **out}))


def check_pallas_grad_hazard(chains=12288):
    """Single-shot compile of the vmapped pallas-backend evidence gradient —
    the r2 OOM configuration. Reports compile+run wall or the failure."""
    from bench import _flagship_problem
    from gptools_tpu.models.gp import GPModel

    model_f, data = _flagship_problem()
    model_p = GPModel(model_f.kernel, cov_backend="pallas")
    data32 = data.astype(jnp.float32)
    thetas = model_p.hyperprior.sample(jax.random.PRNGKey(0), (chains,)).astype(
        jnp.float32
    )

    def loss(ths):
        return jnp.sum(jax.vmap(lambda t: model_p.log_marginal(t, data32))(ths))

    t0 = time.perf_counter()
    try:
        g = jax.jit(jax.grad(loss))(thetas)
        g.block_until_ready()
        wall = time.perf_counter() - t0
        ok = bool(np.isfinite(np.asarray(g)).all())
        print(json.dumps({"check": "pallas_grad_single_shot", "ok": ok,
                          "chains": chains, "compile+run_s": round(wall, 1)}))
    except Exception as e:  # record, don't crash the smoke run
        print(json.dumps({"check": "pallas_grad_single_shot", "ok": False,
                          "chains": chains, "error": str(e)[:300]}))
        return False
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-hazard", action="store_true")
    ap.add_argument("--chains", type=int, default=12288)
    args = ap.parse_args()
    check_backends()
    check_compiled_kernels()
    if not args.skip_hazard:
        check_pallas_grad_hazard(args.chains)
    print("tpu_smoke done on", jax.devices()[0], file=sys.stderr)


if __name__ == "__main__":
    main()
