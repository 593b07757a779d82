"""Streaming inference metrics + profiling hooks.

The reference's observability was ``verbose=`` prints and post-hoc chain
summaries (SURVEY.md section 5, metrics row). Here sampling emits structured
per-window records — step size, pooled acceptance, divergence counts,
leapfrog totals, wall time — that a `MetricsLogger` appends to JSONL (and
keeps in memory), so long multi-host runs are observable while they run and
auditable afterwards. ESS/s is the north-star metric, so `MetricsLogger`
can finalize a run with on-device ESS/R-hat.

`trace` wraps ``jax.profiler`` for per-kernel roofline inspection of the
covariance/leapfrog path.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import numpy as np

__all__ = ["MetricsLogger", "trace"]


class MetricsLogger:
    """Append-only metrics stream for a sampling run."""

    def __init__(self, path: Optional[str] = None, run_name: str = "run"):
        self.path = path
        self.run_name = run_name
        self.records = []
        self._t0 = time.perf_counter()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, event: str, **fields):
        rec = {
            "run": self.run_name,
            "event": event,
            "t": round(time.perf_counter() - self._t0, 4),
        }
        for k, v in fields.items():
            if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
                v = v.item()
            elif hasattr(v, "tolist"):
                v = v.tolist()
            rec[k] = v
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    def log_window(self, phase: str, length: int, outs: dict):
        """Summarize one adaptation/sampling window from the sampler's
        per-iteration outputs (see `gptools_tpu.infer.hmc.run_window`)."""
        fields = dict(
            phase=phase,
            length=length,
            # eps is scalar per iteration for HMC/NUTS, per-rung for PT
            step_size=np.asarray(outs["eps"])[-1],
            mean_accept=float(np.mean(np.asarray(outs["accept_prob"]))),
            divergences=int(np.sum(np.asarray(outs["diverged"]))),
        )
        if "num_leapfrog" in outs:
            fields["leapfrogs"] = int(np.sum(np.asarray(outs["num_leapfrog"])))
        if "swap_frac" in outs:  # parallel tempering windows
            fields["mean_swap_frac"] = float(
                np.mean(np.asarray(outs["swap_frac"]))
            )
        return self.log("window", **fields)

    def finalize(self, samples, wall_time: Optional[float] = None):
        """Compute and log end-of-run ESS / R-hat (residency-driven:
        accelerator-resident samples reduce on device, host arrays use the
        native C++ path — see diagnostics.ess_and_rhat)."""
        from gptools_tpu.utils.diagnostics import ess_and_rhat

        ess, rhat = ess_and_rhat(samples)
        ess, rhat = np.asarray(ess), np.asarray(rhat)
        fields = dict(ess=ess, rhat=rhat, min_ess=float(ess.min()))
        if wall_time is not None:
            fields["wall_s"] = wall_time
            fields["ess_per_s"] = float(ess.min() / wall_time)
        return self.log("final", **fields)


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context: inspect covariance-build / leapfrog
    kernels in xprof/tensorboard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
