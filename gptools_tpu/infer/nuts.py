"""Iterative multinomial NUTS, vectorizable under vmap/pjit.

The reference marginalized GP hyperparameters with emcee's ensemble walkers
(``gptools/core.py :: sample_hyperparameter_posterior``); the north star
replaces them with the No-U-Turn Sampler. Recursion is impossible under jit,
so tree building is ITERATIVE (SURVEY.md section 7.3 hard part #2):

- one ``lax.while_loop`` doubles the trajectory up to ``max_depth`` times;
- each doubling builds its subtree leaf-by-leaf in an inner ``while_loop``,
  doing exactly one leapfrog per leaf;
- generalized U-turn checks for every balanced sub-block [a, b] of the
  subtree are evaluated *incrementally* with O(max_depth) checkpointed
  states: leaf ``a`` (``a`` even) is stored in slot ``popcount(a)``, and
  after adding leaf ``i`` the blocks ending at ``i`` are exactly the slots
  ``popcount(i+1)-1 .. popcount(i+1)-2+trailing_zeros(i+1)`` (the classic
  iterative-NUTS indexing; derived independently in this module's tests
  against a recursive numpy NUTS oracle);
- proposals are progressive-multinomial within a subtree and biased
  progressive across doublings (Betancourt 2017), so no trajectory storage
  is needed at all;
- divergences follow the reference's reject-don't-crash contract: a
  non-finite or > threshold energy error terminates the doubling and the
  chain keeps its current state.

Everything is fixed-shape: under ``vmap`` the while loops become masked
batched loops (chains that finish early idle until the batch finishes —
the usual accelerator trade, SURVEY.md "accept wasted lanes").
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gptools_tpu.infer import hmc as _hmc

__all__ = ["sample", "nuts_transition_builder"]


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


def _uturn(dz, p_a, p_b, inv_mass):
    """Generalized U-turn: trajectory stops expanding when the span dz
    projects negatively on the velocity at either end."""
    va = inv_mass * p_a
    vb = inv_mass * p_b
    return (jnp.dot(dz, va) < 0.0) | (jnp.dot(dz, vb) < 0.0)


class _SubtreeCarry(NamedTuple):
    i: jax.Array
    cur_z: jax.Array
    cur_p: jax.Array
    cur_g: jax.Array
    ckpt_z: jax.Array      # (max_depth + 1, dim)
    ckpt_p: jax.Array
    logw: jax.Array        # subtree multinomial weight (logsumexp)
    prop_z: jax.Array
    prop_logp: jax.Array
    turning: jax.Array
    diverged: jax.Array
    sum_acc: jax.Array
    n_leap: jax.Array
    key: jax.Array


class _TrajCarry(NamedTuple):
    depth: jax.Array
    zl: jax.Array
    pl: jax.Array
    gl: jax.Array
    zr: jax.Array
    pr: jax.Array
    gr: jax.Array
    prop_z: jax.Array
    prop_logp: jax.Array
    logw: jax.Array
    done: jax.Array
    diverged: jax.Array
    sum_acc: jax.Array
    n_leap: jax.Array
    key: jax.Array


def _build_subtree(
    logp_and_grad: Callable,
    edge_z, edge_p, edge_g,
    v, n_leaf, h0, eps, inv_mass, key,
    max_depth: int,
    divergence_threshold: float,
):
    """Build a subtree of ``n_leaf`` leapfrog leaves in direction ``v``.

    Returns (last-leaf state, subtree proposal + weight, flags, stats).
    """
    dim = edge_z.shape[0]
    dtype = edge_z.dtype
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def cond(c: _SubtreeCarry):
        return (c.i < n_leaf) & (~c.turning) & (~c.diverged)

    def body(c: _SubtreeCarry):
        key, k_take = jax.random.split(c.key)
        z, p, logp, g = _hmc.leapfrog(
            logp_and_grad, c.cur_z, c.cur_p, v * eps, inv_mass, grad=c.cur_g
        )
        h = -logp + _hmc.kinetic(p, inv_mass)
        delta = h - h0
        bad = jnp.isnan(delta)
        diverged = bad | (delta > divergence_threshold)
        logw_leaf = jnp.where(bad, neg_inf, -delta)

        # progressive multinomial proposal within the subtree
        logw_new = _logaddexp(c.logw, logw_leaf)
        pr_take = jnp.exp(logw_leaf - jnp.where(jnp.isfinite(logw_new), logw_new, 0.0))
        take = (jax.random.uniform(k_take, dtype=dtype) < pr_take) & ~diverged
        prop_z = jnp.where(take, z, c.prop_z)
        prop_logp = jnp.where(take, logp, c.prop_logp)

        # acceptance statistic (Stan's average Metropolis probability)
        sum_acc = c.sum_acc + jnp.where(bad, 0.0, jnp.minimum(1.0, jnp.exp(-delta)))

        # checkpoint even leaves at slot popcount(i)
        is_even = (c.i % 2) == 0
        slot = jax.lax.population_count(c.i)
        ckpt_z = jnp.where(is_even, c.ckpt_z.at[slot].set(z), c.ckpt_z)
        ckpt_p = jnp.where(is_even, c.ckpt_p.at[slot].set(p), c.ckpt_p)

        # incremental generalized U-turn checks for blocks ending at leaf i
        m = c.i + 1
        pc = jax.lax.population_count(m)
        tz = jax.lax.population_count((m & -m) - 1)
        s_lo = pc - 1
        s_hi = pc - 2 + tz  # inclusive; empty when i is even (tz == 0)

        def check_cond(sc):
            s, turn = sc
            return (s <= s_hi) & (~turn)

        def check_body(sc):
            s, turn = sc
            dz = v * (z - ckpt_z[s])
            turn = turn | _uturn(dz, ckpt_p[s], p, inv_mass)
            return (s + 1, turn)

        _, turning = jax.lax.while_loop(
            check_cond, check_body, (s_lo, jnp.asarray(False))
        )
        turning = turning & ~diverged

        return _SubtreeCarry(
            i=c.i + 1,
            cur_z=z, cur_p=p, cur_g=g,
            ckpt_z=ckpt_z, ckpt_p=ckpt_p,
            logw=logw_new,
            prop_z=prop_z, prop_logp=prop_logp,
            turning=turning, diverged=diverged,
            sum_acc=sum_acc, n_leap=c.n_leap + 1,
            key=key,
        )

    init = _SubtreeCarry(
        i=jnp.zeros((), jnp.int32),
        cur_z=edge_z, cur_p=edge_p, cur_g=edge_g,
        ckpt_z=jnp.zeros((max_depth + 1, dim), dtype),
        ckpt_p=jnp.zeros((max_depth + 1, dim), dtype),
        logw=neg_inf,
        prop_z=edge_z, prop_logp=jnp.zeros((), dtype),
        turning=jnp.asarray(False), diverged=jnp.asarray(False),
        sum_acc=jnp.zeros((), dtype), n_leap=jnp.zeros((), jnp.int32),
        key=key,
    )
    return jax.lax.while_loop(cond, body, init)


def _nuts_transition(
    logp_and_grad: Callable,
    q: jax.Array,
    key: jax.Array,
    eps: jax.Array,
    inv_mass: jax.Array,
    max_depth: int = 10,
    divergence_threshold: float = 1000.0,
):
    """One NUTS update for a single chain (vmapped by the driver)."""
    dim = q.shape[0]
    dtype = q.dtype
    k_mom, k_loop = jax.random.split(key)
    p0 = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
    logp0, g0 = logp_and_grad(q)
    h0 = -logp0 + _hmc.kinetic(p0, inv_mass)

    def cond(c: _TrajCarry):
        return (c.depth < max_depth) & (~c.done)

    def body(c: _TrajCarry):
        key, k_dir, k_sub, k_acc = jax.random.split(c.key, 4)
        v = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0).astype(dtype)
        edge_z = jnp.where(v > 0, c.zr, c.zl)
        edge_p = jnp.where(v > 0, c.pr, c.pl)
        edge_g = jnp.where(v > 0, c.gr, c.gl)
        n_leaf = jnp.asarray(1, jnp.int32) << c.depth

        sub = _build_subtree(
            logp_and_grad, edge_z, edge_p, edge_g,
            v, n_leaf, h0, eps, inv_mass, k_sub,
            max_depth, divergence_threshold,
        )

        ok = (~sub.turning) & (~sub.diverged)

        # biased progressive sampling across doublings
        pr = jnp.minimum(1.0, jnp.exp(sub.logw - c.logw))
        take = ok & (jax.random.uniform(k_acc, dtype=dtype) < pr)
        prop_z = jnp.where(take, sub.prop_z, c.prop_z)
        prop_logp = jnp.where(take, sub.prop_logp, c.prop_logp)
        logw = jnp.where(ok, _logaddexp(c.logw, sub.logw), c.logw)

        # merge endpoints only if the subtree is kept
        upd_r = ok & (v > 0)
        upd_l = ok & (v < 0)
        zr = jnp.where(upd_r, sub.cur_z, c.zr)
        pr_ = jnp.where(upd_r, sub.cur_p, c.pr)
        gr = jnp.where(upd_r, sub.cur_g, c.gr)
        zl = jnp.where(upd_l, sub.cur_z, c.zl)
        pl = jnp.where(upd_l, sub.cur_p, c.pl)
        gl = jnp.where(upd_l, sub.cur_g, c.gl)

        # full-trajectory U-turn check
        turn_full = _uturn(zr - zl, pl, pr_, inv_mass)
        done = (~ok) | turn_full

        return _TrajCarry(
            depth=c.depth + 1,
            zl=zl, pl=pl, gl=gl, zr=zr, pr=pr_, gr=gr,
            prop_z=prop_z, prop_logp=prop_logp, logw=logw,
            done=done,
            diverged=c.diverged | sub.diverged,
            sum_acc=c.sum_acc + sub.sum_acc,
            n_leap=c.n_leap + sub.n_leap,
            key=key,
        )

    init = _TrajCarry(
        depth=jnp.zeros((), jnp.int32),
        zl=q, pl=p0, gl=g0, zr=q, pr=p0, gr=g0,
        prop_z=q, prop_logp=logp0,
        logw=jnp.zeros((), dtype),  # weight of the root leaf: -(h0 - h0)
        done=jnp.asarray(False),
        diverged=jnp.asarray(False),
        sum_acc=jnp.zeros((), dtype),
        n_leap=jnp.zeros((), jnp.int32),
        key=k_loop,
    )
    out = jax.lax.while_loop(cond, body, init)

    stats = {
        "accept_prob": out.sum_acc / jnp.maximum(out.n_leap, 1).astype(dtype),
        "diverged": out.diverged,
        "num_leapfrog": out.n_leap,
    }
    return out.prop_z, out.prop_logp, stats


def nuts_transition_builder(max_depth: int = 10, divergence_threshold: float = 1000.0):
    def builder(logp_and_grad):
        def transition(q, key, eps, inv_mass):
            return _nuts_transition(
                logp_and_grad, q, key, eps, inv_mass,
                max_depth=max_depth,
                divergence_threshold=divergence_threshold,
            )

        return transition

    return builder


def sample(
    logp: Callable,
    u0: jax.Array,
    key: jax.Array,
    num_warmup: int = 500,
    num_samples: int = 1000,
    max_depth: int = 10,
    target_accept: float = 0.8,
    eps0: float = 0.1,
    adapt_mass: bool = True,
    inv_mass0=None,
    divergence_threshold: float = 1000.0,
    logp_params=None,
) -> _hmc.SampleResult:
    """Vectorized multi-chain NUTS with pooled warmup adaptation.

    Same driver as `gptools_tpu.infer.hmc.sample`, with the NUTS transition
    selected by a HASHABLE spec (not a closure), so the compiled window
    programs are reused across repeated calls over the same density
    (`hmc._window_program`). ``logp_params``: optional pytree operand for
    the density (``logp(q, params)``) — run-specific values travel here.
    """
    return _hmc.sample(
        logp,
        u0,
        key,
        num_warmup=num_warmup,
        num_samples=num_samples,
        target_accept=target_accept,
        eps0=eps0,
        adapt_mass=adapt_mass,
        inv_mass0=inv_mass0,
        transition_spec=(
            "nuts", int(max_depth), float(divergence_threshold)
        ),
        logp_params=logp_params,
    )
