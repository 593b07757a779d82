"""On-chip covariance-builder microbenchmark: Pallas vs fused-XLA vs generic.

VERDICT.md r1 item 2: the cov_backend="auto" choice must be justified by
measurements on the real TPU at bench shapes. This script times, for the
flagship Gibbs-tanh kernel (derivative orders {0,1}):

  - build: chain-batched K construction alone (vmap over theta)
  - grad:  d(log-evidence)/d(theta) through the full evidence step (build +
           Cholesky + solves), i.e. what the samplers actually pay

for backends {generic, fused, pallas} at (chains, N) points covering the
bench shape (12288, 27) and larger-N regimes.

Measurement notes (axon tunnel): a single jitted call costs ~25-40 ms of
dispatch RTT, swamping sub-ms kernels — so each timed call runs ``--inner``
iterations chained through a lax.scan (the carry perturbs theta, so XLA
cannot hoist the body) and the reported time is per-iteration. A failure at
one point (e.g. compile OOM) is recorded and the sweep continues.

Usage:  python scripts/bench_cov.py [--repeats 5 --inner 8]
Writes a markdown table to stdout (paste into BASELINE.md).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _problem(n_points):
    import jax.numpy as jnp

    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.ops.kernels import GibbsKernel, TanhWarp

    x = np.linspace(0.0, 1.2, n_points - 2)
    b = DatasetBuilder(1)
    b.add(x, np.sin(3 * x), err_y=0.03)
    b.add(np.array([0.0, 1.2]), np.zeros(2), err_y=0.01, n=1)  # slope obs
    data = b.build()
    kernel = GibbsKernel(warp=TanhWarp())
    theta1 = jnp.asarray([1.0, 0.5, 0.05, 0.1, 1.0], jnp.float32)
    return kernel, data, theta1


def _timeit(fn, *args, repeats, inner):
    """Median per-iteration seconds of ``repeats`` timed calls, each scanning
    ``inner`` iterations on-device."""
    import jax

    jax.block_until_ready(fn(*args))  # compile + warm
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        walls.append((time.perf_counter() - t0) / inner)
    return float(np.median(walls)), float(np.min(walls)), float(np.max(walls))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--inner", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.ops import assemble, fused, pallas_cov

    dev = jax.devices()[0]
    print(f"device: {dev}  inner={args.inner}", file=sys.stderr)

    rows = []

    def record(shape, name, op, result):
        rows.append((shape, name, op, result))
        if isinstance(result, str):
            print(f"{op:13s} {name:8s} {shape}: FAILED {result}", file=sys.stderr)
        else:
            med, lo, hi = result
            print(
                f"{op:13s} {name:8s} {shape}: {med * 1e3:8.3f} ms/iter "
                f"[{lo * 1e3:.3f}, {hi * 1e3:.3f}]",
                file=sys.stderr,
            )

    for chains, n in [(12288, 27), (1024, 256), (256, 1024)]:
        shape = f"({chains}, {n})"
        kernel, data, theta1 = _problem(n)
        thetas = theta1 * jnp.exp(
            0.01 * jax.random.normal(jax.random.PRNGKey(0), (chains, 5))
        )
        nid = fused._order_ids(data.nid, data.multi_indices)
        X = data.Xf.reshape(-1)

        builders = {
            "generic": lambda th: assemble.cov_matrix(
                kernel, th, data.Xf, data.nid, data.Xf, data.nid, data.multi_indices
            ),
            "fused": lambda th: fused.gibbs_tanh_cov_fused(X, nid, th),
            "pallas": lambda th: pallas_cov.gibbs_tanh_cov(X, nid, th),
        }

        def scan_many(per_theta):
            """sum-reduce per-chain scalars across `inner` perturbed sweeps;
            the carry feeds the perturbation so iterations are sequential."""

            def f(ths):
                def body(c, _):
                    out = jax.vmap(per_theta)(ths * (1.0 + 1e-6 * c))
                    return c + 1e-20 * out.sum(), None

                c, _ = jax.lax.scan(
                    body, jnp.zeros((), ths.dtype), None, length=args.inner
                )
                return c

            return jax.jit(f)

        for name, build in builders.items():
            try:
                f = scan_many(lambda th: build(th).sum())
                record(shape, name, "build", _timeit(f, thetas, repeats=args.repeats, inner=args.inner))
            except Exception as e:  # compile OOM etc. — record and continue
                record(shape, name, "build", type(e).__name__)

        for backend in ["fused", "pallas"]:
            model = GPModel(kernel, cov_backend=backend)
            try:
                g = scan_many(
                    lambda th: jax.grad(lambda t: model.log_marginal(t, data))(th).sum()
                )
                record(shape, backend, "evidence-grad", _timeit(g, thetas, repeats=args.repeats, inner=args.inner))
            except Exception as e:
                record(shape, backend, "evidence-grad", type(e).__name__)

    print(f"\ndevice: {dev}, inner={args.inner}, repeats={args.repeats}\n")
    print("| (chains, N) | backend | op | median ms/iter | min | max |")
    print("|---|---|---|---|---|---|")
    for shape, name, op, result in rows:
        if isinstance(result, str):
            print(f"| {shape} | {name} | {op} | FAILED ({result}) | — | — |")
        else:
            med, lo, hi = result
            print(f"| {shape} | {name} | {op} | {med * 1e3:.3f} | {lo * 1e3:.3f} | {hi * 1e3:.3f} |")


if __name__ == "__main__":
    main()
