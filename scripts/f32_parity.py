"""f32-on-TPU posterior parity gate (VERDICT r1 item 6, SURVEY.md 7.3 #5).

The CPU test suite runs x64; the TPU bench runs f32 — this script closes the
loop: config-4 (Gibbs-tanh profile fit, the bench problem) posterior moments
from the f32 pipeline on the CURRENT default device are z-tested against
committed golden moments from the CPU x64 oracle run.

    python scripts/f32_parity.py --golden   # regenerate tests/golden_config4.json
                                            # (forces CPU + x64)
    python scripts/f32_parity.py            # gate: f32 on default device vs golden

Prints one JSON line {"ok": bool, "z": [...], ...}; exit code 1 on failure.
The gate passes when every parameter's |mean_f32 - mean_x64| <= 4 combined
MC standard errors (se = std/sqrt(ESS)) and stds agree within 15%.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden_config4.json",
)

# Sized so the x64 CPU oracle finishes in minutes on a 2-core box; the gate's
# z-test uses MC standard errors from the measured ESS, so chain count only
# sets the tolerance width, not the validity of the comparison.
RUN_KWARGS = dict(num_chains=512, num_warmup=75, num_samples=300, num_particles=1024)
SEED = 7


def run_pipeline():
    import jax

    from gptools_tpu import configs
    from gptools_tpu.infer.pipeline import smc_then_chees
    from gptools_tpu.utils.diagnostics import ess_per_param, split_rhat

    prob = configs.ALL_CONFIGS[4]()
    res = smc_then_chees(
        prob.model, prob.data, jax.random.PRNGKey(SEED), **RUN_KWARGS
    )
    th = np.asarray(res.thetas)
    flat = th.reshape(-1, th.shape[-1])
    ess = np.asarray(ess_per_param(th))
    return {
        "params": list(prob.model.param_names),
        "mean": flat.mean(axis=0).tolist(),
        "std": flat.std(axis=0, ddof=1).tolist(),
        "ess": ess.tolist(),
        "rhat": np.asarray(split_rhat(th)).tolist(),
        "dtype": str(th.dtype),
        "kwargs": RUN_KWARGS,
        "seed": SEED,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--golden", action="store_true", help="regenerate the x64 oracle")
    ap.add_argument("--cpu-f32", action="store_true", help="gate on CPU in f32 (harness check)")
    args = ap.parse_args()

    import jax

    if args.golden or args.cpu_f32:
        jax.config.update("jax_platforms", "cpu")
    if args.golden:
        jax.config.update("jax_enable_x64", True)

    out = run_pipeline()
    out["device"] = str(jax.devices()[0])

    if args.golden:
        assert out["dtype"] == "float64", out["dtype"]
        with open(GOLDEN_PATH, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({"golden_written": GOLDEN_PATH, **{k: out[k] for k in ("mean", "std", "ess")}}))
        return

    if not os.path.exists(GOLDEN_PATH):
        print(
            json.dumps(
                {
                    "ok": False,
                    "error": f"golden file {GOLDEN_PATH} missing - run "
                    "`python scripts/f32_parity.py --golden` (CPU x64) first",
                }
            )
        )
        sys.exit(2)
    with open(GOLDEN_PATH) as f:
        gold = json.load(f)
    if gold.get("kwargs") != RUN_KWARGS or gold.get("seed") != SEED:
        print(
            json.dumps(
                {
                    "ok": False,
                    "error": "golden was generated at different RUN_KWARGS/"
                    "seed - regenerate with --golden",
                    "golden_kwargs": gold.get("kwargs"),
                    "expected": RUN_KWARGS,
                }
            )
        )
        sys.exit(2)
    m, s, e = (np.asarray(out[k]) for k in ("mean", "std", "ess"))
    gm, gs, ge = (np.asarray(gold[k]) for k in ("mean", "std", "ess"))
    se = np.sqrt(s**2 / e + gs**2 / ge)
    z = (m - gm) / se
    ok_mean = bool(np.all(np.abs(z) <= 4.0))
    ok_std = bool(np.all(np.abs(s - gs) <= 0.15 * gs + 4.0 * se))
    ok = ok_mean and ok_std
    print(
        json.dumps(
            {
                "ok": ok,
                "z": np.round(z, 2).tolist(),
                "mean": np.round(m, 5).tolist(),
                "golden_mean": np.round(gm, 5).tolist(),
                "std_rel_err": np.round((s - gs) / gs, 4).tolist(),
                "rhat_max": max(out["rhat"]),
                "dtype": out["dtype"],
                "device": out["device"],
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
