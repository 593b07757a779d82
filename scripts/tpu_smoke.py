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


def check_fused_evidence(chains=12288):
    """Compiled (non-interpret) single-kernel fused evidence
    (ops/evidence_pallas.py) on the chip: value/gradient parity with the
    chains-minor XLA path at the bench shape, plus per-gradient timing for
    both (scan-chained to amortize dispatch RTT)."""
    from bench import _flagship_problem

    model, data = _flagship_problem()
    thetas = model.hyperprior.sample(
        jax.random.PRNGKey(0), (chains,)
    ).astype(jnp.float32)
    thetaT = thetas.T
    fn = model._pallas_evidence_fn(data)
    assert fn is not None, "fused_pallas evidence not eligible on this config"

    def vag_pl(tT):
        ll, pull = jax.vjp(fn, tT)
        return ll, pull(jnp.ones_like(ll))[0]

    ev = model.evidence_backend
    model.evidence_backend = "xla"
    try:

        def vag_xla(tT):
            f = lambda t: model.log_marginal_batch(t.T, data)  # noqa: E731
            ll, pull = jax.vjp(f, tT)
            return ll, pull(jnp.ones_like(ll))[0]

        (llp, gp_), (llx, gx) = (
            jax.jit(vag_pl)(thetaT),
            jax.jit(vag_xla)(thetaT),
        )
    finally:
        model.evidence_backend = ev
    llp, gp_, llx, gx = map(np.asarray, (llp, gp_, llx, gx))
    fin = np.isfinite(llx)
    d = np.abs(llp[fin] - llx[fin])
    ll_err, ll_p99 = float(d.max()), float(np.percentile(d, 99))
    g_scale = np.abs(gx[:, fin]).max()
    g_err = float(np.max(np.abs(gp_[:, fin] - gx[:, fin])) / (g_scale + 1e-30))
    # f32 rounding-ORDER noise between two exact-in-f64 formulations
    # (tests/test_evidence_pallas.py pins f64 agreement to 1e-9): prior
    # draws include ill-conditioned K where the f32 Cholesky cancellation
    # amplifies either path's rounding equally. The statistical acceptance
    # is the f32 parity gate (scripts/f32_parity.py).
    assert ll_err < 0.5 and ll_p99 < 0.05, (ll_err, ll_p99)
    assert g_err < 5e-3, g_err

    times = {}
    for name, vag in [("pallas_fused", vag_pl), ("xla", vag_xla)]:
        if name == "xla":
            model.evidence_backend = "xla"

        def chained(tT, _vag=vag):
            def body(c, _):
                ll, g = _vag(c)
                return c + 0.0 * g, jnp.sum(ll)

            return jax.lax.scan(body, tT, None, length=8)

        try:
            jfn = jax.jit(chained)
            t0 = time.perf_counter()
            jax.block_until_ready(jfn(thetaT))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(10):
                out = jfn(thetaT)
            jax.block_until_ready(out)
            times[name] = {
                "grad_ms": round((time.perf_counter() - t0) / 80 * 1e3, 3),
                "compile_s": round(compile_s, 1),
            }
        finally:
            model.evidence_backend = ev
    print(json.dumps({
        "check": "fused_evidence", "ok": True, "chains": chains,
        "ll_maxerr": round(ll_err, 5), "ll_p99err": round(ll_p99, 5),
        "grad_relerr": round(g_err, 7),
        **{f"{k}_{m}": v for k, d in times.items() for m, v in d.items()},
        "speedup": round(
            times["xla"]["grad_ms"] / times["pallas_fused"]["grad_ms"], 2
        ),
    }))


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
    check_fused_evidence(args.chains)
    if not args.skip_hazard:
        check_pallas_grad_hazard(args.chains)
    print("tpu_smoke done on", jax.devices()[0], file=sys.stderr)


if __name__ == "__main__":
    main()
