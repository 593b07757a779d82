"""Microbench: chains-minor (SoA) batched evidence vs vmapped per-chain path.

Measures COMPILE and RUN wall for value_and_grad of the flagship log
posterior at bench shapes, both layouts:

    python scripts/bench_soa.py --chains 12288
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=12288)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--scan-len", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _flagship_problem

    model, data = _flagship_problem()
    C = args.chains
    key = jax.random.PRNGKey(0)
    thetas = model.hyperprior.sample(key, (C,))
    us = jax.jit(jax.vmap(model.u_of_theta))(thetas)
    us = us.block_until_ready()

    def vag_vmap(u):
        return jax.vmap(jax.value_and_grad(lambda q: model.log_posterior_u(q, data)))(u)

    def vag_batch(u):
        lls, pull = jax.vjp(lambda q: model.log_posterior_u_batch(q, data), u)
        (g,) = pull(jnp.ones_like(lls))
        return lls, g

    from gptools_tpu.ops import fused

    def vag_batch_full(u):
        # full-matrix (non-symmetric) chains-minor build for the A/B.
        # Force the XLA evidence backend: under evidence_backend="auto" on a
        # TPU device log_posterior_u_batch dispatches to the fused Pallas
        # kernel BEFORE flagship_cov_soa ever reads SOA_SYMMETRIC, which
        # would make both soa rows (and speedup_run) time the Pallas kernel
        # and the calibration numbers meaningless (ADVICE r4).
        old_sym, old_be = fused.SOA_SYMMETRIC, model.evidence_backend
        fused.SOA_SYMMETRIC = False
        model.evidence_backend = "xla"
        try:
            return vag_batch(u)
        finally:
            fused.SOA_SYMMETRIC, model.evidence_backend = old_sym, old_be

    def vag_batch_sym(u):
        old_sym, old_be = fused.SOA_SYMMETRIC, model.evidence_backend
        fused.SOA_SYMMETRIC = True
        model.evidence_backend = "xla"
        try:
            return vag_batch(u)
        finally:
            fused.SOA_SYMMETRIC, model.evidence_backend = old_sym, old_be

    def vag_pallas(u):
        # the single-kernel fused Pallas evidence (the "auto" default on TPU)
        old_be = model.evidence_backend
        model.evidence_backend = "fused_pallas"
        try:
            return vag_batch(u)
        finally:
            model.evidence_backend = old_be

    results = {}
    for name, fn in [
        ("vmap", vag_vmap),
        ("soa", vag_batch_full),
        ("soa_sym", vag_batch_sym),
        ("pallas", vag_pallas),
    ]:
        # scan-chained so per-iteration cost isn't swamped by dispatch RTT
        def chained(u, _fn=fn):
            def body(carry, _):
                lls, g = _fn(carry)
                return carry + 0.0 * g, jnp.sum(lls)
            return jax.lax.scan(body, u, None, length=args.scan_len)

        jfn = jax.jit(chained)
        t0 = time.perf_counter()
        out = jfn(us)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(us)
        jax.block_until_ready(out)
        per_grad_ms = (time.perf_counter() - t0) / args.iters / args.scan_len * 1e3
        results[name] = {
            "compile_s": round(compile_s, 2),
            "grad_ms": round(per_grad_ms, 3),
            "ll_sum_last": float(out[1][-1]),
        }
        print(json.dumps({"path": name, **results[name]}), flush=True)

    print(json.dumps({
        "chains": C,
        "device": str(jax.devices()[0]),
        "speedup_run": round(results["vmap"]["grad_ms"] / results["soa"]["grad_ms"], 2),
        "speedup_compile": round(results["vmap"]["compile_s"] / results["soa"]["compile_s"], 2),
        "speedup_sym_vs_full": round(
            results["soa"]["grad_ms"] / results["soa_sym"]["grad_ms"], 2
        ),
        "speedup_pallas_vs_sym": round(
            results["soa_sym"]["grad_ms"] / results["pallas"]["grad_ms"], 2
        ),
    }))


if __name__ == "__main__":
    main()
