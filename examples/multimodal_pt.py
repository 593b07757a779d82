"""Parallel tempering on a multimodal hyperparameter posterior.

The flagship Gibbs-tanh pedestal fit (BASELINE.json config 4) has a genuinely
multimodal hyperposterior: the edge length scale trades off against the warp
transition location (BASELINE.md finding 3). Prior-initialized
single-temperature chains get stuck in one mode each and split R-hat explodes;
this example shows the two gradient-based fixes this framework ships:

  1. replica-exchange HMC (``sampler='pt'`` — the reference's
     ``sampler_type='pt'`` / emcee PTSampler counterpart, re-designed so the
     temperature ladder is a vmapped array axis, `gptools_tpu.infer.pt`), and
  2. the SMC warm-started pipeline (``sampler='smc+chees'``, the bench
     default).

    python examples/multimodal_pt.py          # runs on the default backend
    python examples/multimodal_pt.py --cpu    # force CPU
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--samples", type=int, default=400)
    ap.add_argument("--warmup", type=int, default=300)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _flagship_problem
    from gptools_tpu.infer import run_sampler
    from gptools_tpu.utils.diagnostics import split_rhat

    model, data = _flagship_problem()
    key = jax.random.PRNGKey(0)
    names = model.param_names

    def report(tag, res, wall):
        rhat = np.asarray(split_rhat(res.thetas))
        th = np.asarray(res.thetas).reshape(-1, len(names))
        print(f"\n== {tag} ({wall:.1f}s) ==")
        print(f"  max split R-hat: {rhat.max():.3f}")
        for i, n in enumerate(names):
            print(
                f"  {n:>8s}: mean {th[:, i].mean():8.4f}  "
                f"sd {th[:, i].std():7.4f}  R-hat {rhat[i]:.3f}"
            )

    # 1) prior-initialized single-temperature NUTS: chains split across modes
    t0 = time.time()
    res_nuts = run_sampler(
        model, data, key, sampler="nuts",
        num_chains=args.chains, num_samples=args.samples,
        num_warmup=args.warmup,
    )
    report(
        "prior-init NUTS (mode-split chains show up as R-hat >> 1 at scale)",
        res_nuts,
        time.time() - t0,
    )

    # 2) parallel tempering: hot rungs cross the barrier, swaps ferry it down
    t0 = time.time()
    res_pt = run_sampler(
        model, data, key, sampler="pt",
        num_chains=args.chains, num_samples=args.samples,
        num_warmup=args.warmup, num_temps=6, beta_min=0.05,
    )
    report("parallel tempering (6 rungs)", res_pt, time.time() - t0)
    sw = np.asarray(res_pt.diagnostics["swap_accept"])
    print(f"  swap acceptance along ladder: {np.round(sw, 2)}")

    # 3) the bench pipeline: tempered SMC warm start + whitened ChEES-HMC
    t0 = time.time()
    res_pipe = run_sampler(
        model, data, key, sampler="smc+chees",
        num_chains=args.chains, num_samples=args.samples,
        num_warmup=min(args.warmup, 100),
    )
    report("SMC -> whitened ChEES (bench pipeline)", res_pipe, time.time() - t0)


if __name__ == "__main__":
    main()
