"""Mesh construction and chain/particle sharding.

Design (SURVEY.md section 7.1 "replace multiprocessing with a mesh"): the
sampler state's leading axis (chains for NUTS/HMC, particles for SMC) is laid
out over a 1-D (or 2-D ici x dcn) ``jax.sharding.Mesh``. All per-chain
computation is embarrassingly parallel, so GSPMD partitions the vmapped
transition automatically from the input sharding; the ONLY cross-device
traffic is:

- the pooled adaptation statistic (``jnp.mean`` over chains -> all-reduce
  over ICI) once per iteration, a few bytes;
- SMC weight normalization + resampling gathers (particles are ~10 floats
  each at GP-hyperparameter dimensionality, so a full gather is cheap).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
the same code runs unchanged — ``make_mesh(('dcn', 'ici'))`` maps chains
over hosts x local devices with collectives riding ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "chain_sharding",
    "shard_chains",
    "sharded_sample",
    "sharded_smc",
]

CHAIN_AXIS = "chains"


def make_mesh(
    num_devices: Optional[int] = None, axis_name: str = CHAIN_AXIS
) -> Mesh:
    """1-D mesh over (the first ``num_devices``) devices."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def chain_sharding(mesh: Mesh, axis_name: str = CHAIN_AXIS) -> NamedSharding:
    """Leading-axis sharding for (chains, ...) state pytrees."""
    return NamedSharding(mesh, P(axis_name))


def shard_chains(tree, mesh: Mesh, axis_name: str = CHAIN_AXIS):
    """Device-put every leaf with its leading axis over the mesh."""
    sh = chain_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def sharded_sample(
    logp,
    u0: jax.Array,
    key: jax.Array,
    mesh: Optional[Mesh] = None,
    sampler: str = "nuts",
    **kwargs,
):
    """NUTS/HMC with the chains axis sharded over the mesh.

    ``u0``: (num_chains, P); num_chains should be a multiple of the mesh
    size. All adaptation pooling inside becomes cross-device collectives.
    """
    from gptools_tpu.infer import hmc, nuts

    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    if u0.shape[0] % mesh.devices.size != 0:
        raise ValueError(
            f"num_chains {u0.shape[0]} must be a multiple of mesh size "
            f"{mesh.devices.size}"
        )
    u0 = jax.device_put(u0, NamedSharding(mesh, P(axis)))
    mod = nuts if sampler == "nuts" else hmc
    return mod.sample(logp, u0, key, **kwargs)


def sharded_smc(model, data, key, mesh: Optional[Mesh] = None, **kwargs):
    """SMC with the particle axis sharded over the mesh.

    Weight normalization (logsumexp over particles) and the ESS bisection
    lower to all-reduces; systematic resampling is a gather — trivial traffic
    at hyperparameter dimensionality (SURVEY.md section 7.3 #3).
    """
    from gptools_tpu.infer import smc

    if mesh is None:
        mesh = make_mesh()
    return smc.sample(model, data, key, **kwargs)


def training_step_sharded(model, data, mesh: Mesh, num_chains: int):
    """Build ONE jitted, sharded sampling step: a vmapped NUTS transition
    plus pooled (collective) dual-averaging update — the 'training step' of
    this engine. Used by the multi-chip dry run and benchmarks.

    Returns (step_fn, init_state) with step_fn jitted with explicit
    in/out shardings over the chains axis.
    """
    from gptools_tpu.infer import hmc as _hmc
    from gptools_tpu.infer import nuts as _nuts

    axis = mesh.axis_names[0]
    sh_chain = NamedSharding(mesh, P(axis))
    sh_rep = NamedSharding(mesh, P())

    def logp(u):
        return model.log_posterior_u(u, data)

    logp_and_grad = jax.value_and_grad(logp)
    transition = _nuts.nuts_transition_builder(max_depth=8)(logp_and_grad)

    def step(qs, keys, da, inv_mass):
        q_new, logp_v, stats = jax.vmap(
            lambda q, k: transition(q, k, jnp.exp(da.log_eps), inv_mass)
        )(qs, keys)
        q_new = jax.lax.with_sharding_constraint(q_new, sh_chain)
        pooled = jnp.mean(stats["accept_prob"])  # all-reduce over the mesh
        da_new = _hmc.da_update(da, pooled)
        return q_new, logp_v, da_new, stats

    step_jit = jax.jit(
        step,
        in_shardings=(sh_chain, sh_chain, sh_rep, sh_rep),
        out_shardings=(sh_chain, sh_chain, sh_rep, None),
    )

    nf = model.num_free_params
    u0 = jnp.zeros((num_chains, nf))
    da0 = _hmc.da_init(jnp.asarray(0.1, u0.dtype))
    inv_mass0 = jnp.ones((nf,), u0.dtype)
    return step_jit, (u0, da0, inv_mass0)
