"""Benchmark: ESS/s on the flagship Gibbs-kernel GP hyperparameter posterior.

The north-star metric (BASELINE.json): effective samples per second per chip
on a Gibbs-tanh-kernel profile fit with derivative constraints, sampled with
vectorized NUTS. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "ESS/s", "vs_baseline": R}

``vs_baseline`` compares against the CPU reference pipeline stand-in (numpy
GP oracle + affine-invariant ensemble sampler — the same algorithm emcee
runs for the reference; emcee itself is not installed, see SURVEY.md §0),
measured on this machine via ``python bench.py --baseline`` and recorded
below / in BASELINE.md.
"""

import argparse
import json
import sys
import time

import numpy as np

# CPU reference-pipeline ESS/s measured on this machine via --baseline
# (see BASELINE.md for the measurement protocol and raw numbers).
CPU_BASELINE_ESS_PER_S = 5.97  # mean of two --baseline runs (6.33, 5.62)


def _flagship_problem(n_points=25):
    """Config-4-style problem, sized like a realistic pedestal profile fit."""
    from gptools_tpu.models.dataset import DatasetBuilder
    from gptools_tpu.models.gp import GPModel
    from gptools_tpu.ops.kernels import GibbsKernel1dTanh
    from gptools_tpu.utils.priors import LogNormalJointPrior, UniformJointPrior

    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 1.2, n_points)
    x0 = 0.9
    prof = 1.0 - 0.5 * np.minimum(x, x0) ** 2
    edge = x > x0
    prof[edge] = (1.0 - 0.5 * x0**2) * np.exp(-(x[edge] - x0) / 0.05)
    y = prof + 0.03 * rng.standard_normal(n_points)
    b = DatasetBuilder(1)
    b.add(x, y, err_y=0.03)
    b.add(np.array([0.0]), np.array([0.0]), err_y=0.01, n=1)  # core slope = 0
    b.add(np.array([1.2]), np.array([0.0]), err_y=0.05, n=1)  # edge slope ~ 0
    data = b.build()
    prior = (
        LogNormalJointPrior([0.0], [0.75])
        * LogNormalJointPrior([-1.0], [0.6])
        * LogNormalJointPrior([-2.3], [0.6])
        * LogNormalJointPrior([-2.3], [0.6])
        * UniformJointPrior([0.6], [1.1])
    )
    model = GPModel(GibbsKernel1dTanh(hyperprior=prior))
    return model, data


def run_tpu_bench(num_chains=12288, num_warmup=75, num_samples=800, seed=0):
    """End-to-end posterior production with the flagship pipeline:
    adaptive tempered SMC -> massively parallel SMC-initialized NUTS.
    Wall clock covers the FULL pipeline (SMC included)."""
    import jax
    import jax.numpy as jnp

    # NOTE: do NOT enable the persistent compilation cache here — restoring
    # cached executables through the axon TPU plugin crashed the worker in
    # testing; compiles are primed by the first (untimed) run instead.
    from gptools_tpu.infer.pipeline import smc_then_chees
    from gptools_tpu.utils.diagnostics import ess_per_param, split_rhat

    model, data = _flagship_problem()
    key = jax.random.PRNGKey(seed)

    def run():
        res = smc_then_chees(
            model,
            data,
            key,
            num_chains=num_chains,
            num_warmup=num_warmup,
            num_samples=num_samples,
            num_particles=1024,
            max_steps=256,
        )
        jax.block_until_ready(res.u)
        return res

    run()  # compile everything at the real shapes, outside the clock
    t0 = time.perf_counter()
    res = run()
    wall = time.perf_counter() - t0

    thetas = res.thetas
    ess = np.asarray(ess_per_param(thetas))
    rhat = np.asarray(split_rhat(thetas))
    min_ess = float(ess.min())
    info = {
        "wall_s": wall,
        "min_ess": min_ess,
        "ess": ess.tolist(),
        "rhat": rhat.tolist(),
        "divergences": int(res.diagnostics["divergences"]),
        "num_chains": num_chains,
        "num_samples": num_samples,
        "device": str(jax.devices()[0]),
    }
    return min_ess / wall, info


def run_cpu_baseline(num_steps=1200, burn=400, walkers=16, seed=0):
    """Reference pipeline stand-in: numpy-driven ensemble sampler over the
    same posterior, single process (the reference's default num_proc usage
    evaluates walkers serially per step)."""
    import jax
    import jax.numpy as jnp

    from gptools_tpu.utils.diagnostics import ess_per_param
    from tests.oracle.ensemble import run_ensemble

    model, data = _flagship_problem()
    lp_jit = jax.jit(lambda t: model.log_posterior(t, data))

    def log_prob(theta):
        return float(lp_jit(jnp.asarray(theta)))

    rng = np.random.default_rng(seed)
    p0 = np.asarray(model.hyperprior.sample(jax.random.PRNGKey(seed), (walkers,)))
    log_prob(p0[0])  # compile outside the clock
    t0 = time.perf_counter()
    chain, _, acc = run_ensemble(log_prob, p0, num_steps, rng)
    wall = time.perf_counter() - t0
    kept = chain[burn:]  # (S, W, P)
    series = np.swapaxes(kept, 0, 1)  # (W, S, P)
    ess = np.asarray(ess_per_param(series))
    return float(ess.min()) / wall, {
        "wall_s": wall,
        "min_ess": float(ess.min()),
        "accept": acc,
    }


def _run_with_retries(argv, attempts=3, cooldown=240):
    """Run the measurement in a child process and retry on TPU-worker
    crashes (the axon tunnel intermittently kills the worker mid-run; a dead
    backend cannot be recovered in-process). Prints the child's final JSON
    line on success."""
    import subprocess

    for attempt in range(attempts):
        proc = subprocess.run(
            [sys.executable, __file__, "--child"] + argv,
            capture_output=True,
            text=True,
        )
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            if proc.stderr:
                sys.stderr.write(proc.stderr)
            print(lines[-1])
            return 0
        sys.stderr.write(
            f"bench attempt {attempt + 1}/{attempts} failed "
            f"(rc={proc.returncode}):\n{proc.stderr[-2000:]}\n"
        )
        if attempt + 1 < attempts:
            time.sleep(cooldown)
    return 1


def main():
    ap = argparse.ArgumentParser()
    # NOTE: --platform handled before jax import below
    ap.add_argument("--baseline", action="store_true", help="measure the CPU reference pipeline")
    ap.add_argument("--chains", type=int, default=12288)
    ap.add_argument("--samples", type=int, default=800)
    ap.add_argument("--warmup", type=int, default=75)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--child", action="store_true", help="internal: run the measurement in-process")
    args = ap.parse_args()

    if not args.child and not args.baseline:
        argv = [
            "--chains", str(args.chains),
            "--samples", str(args.samples),
            "--warmup", str(args.warmup),
        ]
        if args.verbose:
            argv.append("--verbose")
        sys.exit(_run_with_retries(argv))

    if args.baseline:
        # the CPU reference pipeline must run on CPU even when the TPU
        # plugin is present (the axon plugin ignores JAX_PLATFORMS env)
        import jax

        jax.config.update("jax_platforms", "cpu")
        val, info = run_cpu_baseline()
        if args.verbose:
            print(json.dumps(info), file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "cpu_baseline_ess_per_s_gibbs_ensemble",
                    "value": round(val, 4),
                    "unit": "ESS/s",
                    "vs_baseline": 1.0,
                }
            )
        )
        return

    val, info = run_tpu_bench(
        num_chains=args.chains, num_warmup=args.warmup, num_samples=args.samples
    )
    if args.verbose:
        print(json.dumps(info), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "ess_per_s_gibbs_smc_chees",
                "value": round(val, 2),
                "unit": "ESS/s",
                "vs_baseline": round(val / CPU_BASELINE_ESS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
