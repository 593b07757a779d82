"""Persistent XLA compilation cache (opt-in).

At round-5 execution speeds the one-time compile wall IS the product's
latency: the flagship pipeline executes in ~3 s but pays 1-2 minutes of
XLA compiles on a cold process (BASELINE.md r4/r5 compile-wall notes).
JAX ships a persistent on-disk compilation cache that eliminates repeat
compiles across processes; it was abandoned in round 1 because restoring
cached executables through the axon TPU plugin crashed the worker
(BASELINE.md r1 finding 4).

Round 5 re-tested it behind a subprocess fence (``scripts/cache_probe.py``):
the crash is gone on the current plugin — cold 48.7 s vs warm 19.4 s on the
representative fused-evidence-vjp program, child rc=0 both phases. This
module is the adoption point: call :func:`enable` early (before the first
``jit`` compilation) in any process that wants cross-process compile reuse.

Reference correspondence: the reference has no compile step at all (eager
torch/numpy); this subsystem exists because the TPU design trades a
one-time compile for ~10^5x execution speed, and the cache amortizes that
trade across processes.
"""

import os

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".xla_cache",
)


def enable(cache_dir=None, min_compile_secs=1.0):
    """Enable the persistent compilation cache for this process.

    Must run before the first compilation to affect it (programs compiled
    earlier are simply not cached). Never raises: on any failure the process
    just runs uncached, which is always correct. Returns True if enabled.

    ``min_compile_secs``: only programs whose compile took at least this
    long are persisted — keeps the cache to the expensive programs (the
    evidence vjp, sampler chunks, SMC rounds) and out of the dispatch path
    for trivial ones.
    """
    import jax

    cache_dir = cache_dir or os.environ.get("GPTOOLS_XLA_CACHE_DIR", DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # pragma: no cover — safety net, uncached is correct
        return False
