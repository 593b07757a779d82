"""Post-fused-kernel performance sweep: chunk size and chain count.

Round 4 made the evidence gradient ~22x cheaper (ops/evidence_pallas.py),
so the sampler wall is no longer gradient-bound — per-iteration XLA glue,
host chunk dispatches over the axon tunnel, and the SMC stage become
visible. This script measures, in ONE process (so compiled programs are
reused across repeats of the same config):

  - chunk size (iterations per device call): fewer host dispatches vs
    compile per distinct chunk value;
  - chain count: ESS scales ~linearly with chains, wall should too now
    that the kernel is grid-sequential over 1024-chain blocks — flat
    ESS/s unless fixed per-iteration overhead amortizes.

    python scripts/sweep_perf.py --chunks 25 75 150 --chains 12288 24576

Each run prints one JSON line (same fields as bench repeats).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="*", default=[25, 75, 150])
    ap.add_argument("--chains", type=int, nargs="*", default=[12288, 24576])
    ap.add_argument("--warmup", type=int, default=75)
    ap.add_argument("--samples", type=int, default=300)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import _flagship_problem
    from gptools_tpu.infer.pipeline import smc_then_chees
    from gptools_tpu.utils.diagnostics import ess_and_rhat

    model, data = _flagship_problem()

    def run(seed, chains, chunk, label, prime=False):
        key = jax.random.PRNGKey(seed)
        kw = dict(
            num_chains=chains, num_warmup=args.warmup,
            num_samples=args.samples, num_particles=1024, max_steps=256,
            chees_kwargs={"chunk": chunk},
        )
        if prime:  # tiny shapes share the chunk programs (shape-generic)
            kw.update(num_warmup=chunk, num_samples=chunk)
        t0 = time.perf_counter()
        res = smc_then_chees(model, data, key, **kw)
        jax.block_until_ready(res.u)
        wall = time.perf_counter() - t0
        if prime:
            print(json.dumps({"label": label, "prime_wall_s": round(wall, 2)}),
                  flush=True)
            return
        ess, rhat = ess_and_rhat(res.thetas)
        ess = np.asarray(ess)
        print(json.dumps({
            "label": label,
            "seed": seed,
            "chains": chains,
            "chunk": chunk,
            "wall_s": round(wall, 3),
            "min_ess": round(float(ess.min()), 1),
            "ess_per_s": round(float(ess.min()) / wall, 1),
            "rhat_max": round(float(np.asarray(rhat).max()), 5),
            "divergences": int(res.diagnostics["divergences"]),
            "leapfrogs": int(res.diagnostics["num_leapfrog_total"]),
        }), flush=True)

    for chains in args.chains:
        for chunk in args.chunks:
            label = f"C{chains}_chunk{chunk}"
            run(0, chains, chunk, label + "_prime", prime=True)
            for seed in args.seeds:
                run(seed, chains, chunk, label)


if __name__ == "__main__":
    main()
