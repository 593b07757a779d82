"""Persistent-XLA-compilation-cache probe (VERDICT r4 weak #4 / next #6).

Round-1 finding: restoring cached executables through the axon TPU plugin
crashed the worker, so the cache was abandoned and every bench pays full
compiles. This probe re-tests the cache behind a SUBPROCESS FENCE so a
crash costs nothing:

  phase 1 (child): enable cache dir, compile + run a representative program
  (the fused evidence vjp), exit
  phase 2 (child): same program, same cache dir — measure the compile wall;
  a crash or no speedup = documented no-go, a speedup = safe to adopt

Usage: python scripts/cache_probe.py            # runs both phases
       python scripts/cache_probe.py --child N  # internal
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = "/root/repo/.xla_cache_probe"


def child(phase):
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from bench import _flagship_problem

    model, data = _flagship_problem()
    us = jax.jit(jax.vmap(model.u_of_theta))(
        model.hyperprior.sample(jax.random.PRNGKey(0), (4096,))
    ).block_until_ready()

    def vag(u):
        ll, pull = jax.vjp(lambda q: model.log_posterior_u_batch(q, data), u)
        (g,) = pull(jnp.ones_like(ll))
        return ll, g

    jfn = jax.jit(vag)
    t0 = time.perf_counter()
    out = jfn(us)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    print(json.dumps({"phase": phase, "compile_plus_run_s": round(wall, 2)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child)
        return
    os.makedirs(CACHE_DIR, exist_ok=True)
    results = []
    for phase in (1, 2):
        p = subprocess.run(
            [sys.executable, __file__, "--child", str(phase)],
            capture_output=True, text=True, timeout=1200,
        )
        ok = p.returncode == 0
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        results.append({
            "phase": phase,
            "rc": p.returncode,
            "result": json.loads(line[-1]) if ok and line else None,
            "stderr_tail": p.stderr[-500:] if not ok else "",
        })
        print(json.dumps(results[-1]), flush=True)
        if not ok:
            print(json.dumps({"verdict": "NO-GO: child crashed", "phase": phase}))
            return
    w1 = results[0]["result"]["compile_plus_run_s"]
    w2 = results[1]["result"]["compile_plus_run_s"]
    n_entries = len(os.listdir(CACHE_DIR))
    print(json.dumps({
        "verdict": "GO" if w2 < 0.5 * w1 else "no speedup",
        "cold_s": w1, "warm_s": w2, "cache_entries": n_entries,
    }))


if __name__ == "__main__":
    main()
