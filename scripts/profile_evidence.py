"""Evidence-step breakdown + xprof trace at bench shapes (VERDICT r1 item 3).

Times each stage of the sampler hot path at the bench shape
(chains x N = 12288 x 27, Gibbs-tanh, derivative orders {0,1}):

    cov build -> (+noise/jitter) -> Cholesky -> solves + logdet  = evidence
    evidence -> grad                                             = leapfrog unit
    full ChEES transition (L leapfrogs)

and captures a jax.profiler trace of the grad stage to --trace-dir
(committed artifact for the roofline verdict). All timings scan-chained
(``--inner`` iterations per call) to amortize the axon tunnel dispatch RTT.

Usage: python scripts/profile_evidence.py [--chains 12288 --n 27 --inner 8]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=12288)
    ap.add_argument("--n", type=int, default=27)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--trace-dir", default=None, help="write an xprof trace here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.ops import fused
    from gptools_tpu.ops.kernels import GibbsKernel, TanhWarp

    x = np.linspace(0.0, 1.2, args.n - 2)
    b = DatasetBuilder(1)
    b.add(x, np.sin(3 * x), err_y=0.03)
    b.add(np.array([0.0, 1.2]), np.zeros(2), err_y=0.01, n=1)
    data = b.build()
    kernel = GibbsKernel(warp=TanhWarp())
    model = GPModel(kernel)
    theta1 = jnp.asarray([1.0, 0.5, 0.05, 0.1, 1.0], jnp.float32)
    thetas = theta1 * jnp.exp(
        0.01 * jax.random.normal(jax.random.PRNGKey(0), (args.chains, 5))
    )
    nid = fused._order_ids(data.nid, data.multi_indices)
    X = data.Xf.reshape(-1)

    def scan_chain(per_theta):
        def f(ths):
            def body(c, _):
                out = jax.vmap(per_theta)(ths * (1.0 + 1e-6 * c))
                return c + 1e-20 * out.sum(), None

            c, _ = jax.lax.scan(
                body, jnp.zeros((), ths.dtype), None, length=args.inner
            )
            return c

        return jax.jit(f)

    def timeit(fn):
        jax.block_until_ready(fn(thetas))
        walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(thetas))
            walls.append((time.perf_counter() - t0) / args.inner)
        return float(np.median(walls))

    from gptools_tpu.ops import evidence as ev

    stages = {}
    # 1. cov build only
    stages["cov_build"] = timeit(
        scan_chain(lambda th: fused.gibbs_tanh_cov_fused(X, nid, th).sum())
    )
    # 2. build + factorization (Cholesky fwd)
    def chol_only(th):
        # rebuild K so theta feeds it (keeps scan non-hoistable), then factor
        K = model._latent_cov(th, data, True) + 1e-6 * jnp.eye(
            data.Xf.shape[0], dtype=th.dtype
        )
        L = ev.small_cholesky(K)
        return L[..., -1, -1]

    stages["build+chol"] = timeit(scan_chain(chol_only))
    # 3. full evidence forward
    stages["evidence_fwd"] = timeit(
        scan_chain(lambda th: model.log_marginal(th, data))
    )
    # 4. evidence gradient (the leapfrog unit)
    grad_fn = jax.grad(lambda th: model.log_marginal(th, data))
    stages["evidence_grad"] = timeit(scan_chain(lambda th: grad_fn(th).sum()))

    dev = jax.devices()[0]
    print(f"\ndevice: {dev}  chains={args.chains} N={data.Xf.shape[0]}")
    print("| stage | ms / batched eval | per-chain us | note |")
    print("|---|---|---|---|")
    notes = {
        "cov_build": "fused XLA, all four {0,1} blocks",
        "build+chol": "+ unrolled static-N Cholesky",
        "evidence_fwd": "+ solves, logdet, prior",
        "evidence_grad": "fwd + VJP (what each leapfrog pays)",
    }
    for k, v in stages.items():
        print(
            f"| {k} | {v * 1e3:.2f} | {v * 1e6 / args.chains:.3f} | {notes[k]} |"
        )
    d = {k: round(v * 1e3, 3) for k, v in stages.items()}
    print(d, file=sys.stderr)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            jax.block_until_ready(scan_chain(lambda th: grad_fn(th).sum())(thetas))
        print(f"trace written to {args.trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
