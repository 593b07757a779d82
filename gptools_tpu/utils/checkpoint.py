"""Checkpoint / resume of inference state.

The reference has no persistence subsystem — users pickled the
``GaussianProcess`` or kept ``sampler.chain`` arrays by hand (SURVEY.md
section 5, checkpoint row). Here checkpointing is first-class: any sampler
state (chain positions, dual-averaging state, Welford moments, SMC particle
ensembles, PRNG keys — all pytrees of arrays) round-trips through orbax with
deterministic resume. Multi-host: orbax handles distributed arrays natively,
so a sharded chain state saves/restores with its sharding.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_state", "restore_state", "CheckpointManager"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: Any) -> None:
    """Save a pytree-of-arrays inference state to ``path`` (a directory)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, state, force=True)


def restore_state(path: str, template: Optional[Any] = None) -> Any:
    """Restore an inference state; ``template`` (a matching pytree of arrays)
    restores dtypes/shardings exactly."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


class CheckpointManager:
    """Periodic checkpointing with retention, for long sampling runs.

    Thin wrapper over ``orbax.checkpoint.CheckpointManager`` keeping this
    library's call sites independent of orbax API churn.
    """

    def __init__(self, directory: str, max_to_keep: int = 3, save_every: int = 1):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, save_interval_steps=save_every
            ),
        )

    def save(self, step: int, state: Any) -> bool:
        import orbax.checkpoint as ocp

        return self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None, template: Optional[Any] = None):
        import orbax.checkpoint as ocp

        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    @property
    def latest_step(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
