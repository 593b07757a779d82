"""Run any of the five BASELINE.json configurations end to end.

    python examples/run_config.py 1          # SE GP MAP fit
    python examples/run_config.py 4 --plot   # Gibbs profile fit via SMC

Prints a posterior/MAP summary; --plot writes predictive-envelope and
corner plots next to this script.
"""

import argparse
import os
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", type=int, choices=[1, 2, 3, 4, 5])
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument(
        "--mesh",
        type=int,
        nargs="?",
        const=-1,
        default=None,
        metavar="N",
        help="shard chains/particles over an N-device mesh (default: all "
        "devices). Config 5 runs sharded by default; combine with "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8 --cpu to "
        "exercise the multi-chip path without a pod.",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gptools_tpu import configs
    from gptools_tpu.infer import map_fit, run_sampler
    from gptools_tpu.utils import plotting

    prob = configs.ALL_CONFIGS[args.config]()
    print(f"== {prob.name}: {prob.description}")
    print(f"   data: {prob.data}")
    key = jax.random.PRNGKey(0)

    sampler_kwargs = dict(prob.sampler_kwargs)
    mesh_n = args.mesh
    if mesh_n is None and args.config == 5 and len(jax.devices()) > 1:
        mesh_n = -1  # config 5 is the sharded config: use every device
    if mesh_n is not None and prob.sampler in ("smc+chees", "smc+nuts", "smc"):
        from gptools_tpu.parallel import make_mesh

        mesh = make_mesh(None if mesh_n == -1 else mesh_n)
        sampler_kwargs["mesh"] = mesh
        print(f"   mesh: {mesh.devices.size} devices over axis {mesh.axis_names}")
    elif args.mesh is not None:
        print(
            f"   WARNING: --mesh ignored — sampler {prob.sampler!r} for "
            f"config {args.config} does not support mesh sharding (only "
            "smc/smc+chees/smc+nuts do); running unsharded."
        )

    t0 = time.perf_counter()
    if prob.sampler is None:
        res = map_fit.optimize(prob.model, prob.data, key, **prob.sampler_kwargs)
        print(f"   MAP log posterior: {float(res.log_posterior):.3f}")
        for name, val in zip(prob.model.param_names, np.asarray(res.theta)):
            print(f"   {name:>12s} = {val:.4f}")
        theta = res.theta
    else:
        res = run_sampler(
            prob.model, prob.data, key, sampler=prob.sampler, **sampler_kwargs
        )
        summary = plotting.summarize_sampler(res, param_names=prob.model.param_names)
        print(f"   sampler: {prob.sampler}; wall: {time.perf_counter()-t0:.1f}s")
        for i, name in enumerate(summary["params"]):
            print(
                f"   {name:>12s} = {summary['mean'][i]:.4f} "
                f"+- {summary['std'][i]:.4f}  "
                f"[ESS {summary['ess'][i]:.0f}, Rhat {summary['rhat'][i]:.3f}]"
            )
        theta = np.asarray(res.thetas).reshape(-1, prob.model.num_params).mean(axis=0)

    if args.plot:
        import jax.numpy as jnp

        out = os.path.dirname(os.path.abspath(__file__))
        X = prob.truth["X"]
        xs = np.linspace(X.min(), X.max(), 200)
        pred = prob.model.predict(jnp.asarray(theta), prob.data, xs)
        ax = plotting.univariate_envelope_plot(
            xs, np.asarray(pred.mean), std=np.asarray(pred.std), label="posterior"
        )
        truth_key = "f" if "f" in prob.truth else "profile"
        ax.plot(X, prob.truth[truth_key], "k--", label="truth")
        ax.legend()
        fig_path = os.path.join(out, f"{prob.name}_fit.png")
        ax.figure.savefig(fig_path, dpi=120)
        print(f"   wrote {fig_path}")
        if prob.sampler is not None:
            corner_path = os.path.join(out, f"{prob.name}_corner.png")
            plotting.plot_sampler(
                res, param_names=prob.model.param_names, path=corner_path
            )
            print(f"   wrote {corner_path}")


if __name__ == "__main__":
    main()
