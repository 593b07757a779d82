"""ChEES-HMC: jittered fixed-length HMC with cross-chain adaptive trajectory
length (Hoffman, Radul & Sountsov, AISTATS 2021).

Why it is THE accelerator-native sampler for this engine: NUTS builds a
different-size trajectory per chain, so under ``vmap`` every chain pays for
the deepest tree in the batch (masked lanes). ChEES instead runs the SAME
number of leapfrog steps for every chain each iteration — perfect
vectorization, zero wasted lanes — and adapts that shared trajectory length
from CROSS-CHAIN statistics, which fits this library's pooled-collective
design exactly (the adaptation reductions become psums over the mesh).

Algorithm per iteration t:
  - halton jitter: L_t = max(1, ceil(h_t * tau / eps)), h_t in (0, 1];
  - all chains leapfrog L_t steps, Metropolis accept;
  - ChEES criterion gradient for tau: with centered proposal dq' = q' - mean(q')
    and end velocity v', per-chain estimate
        g = (||dq'||^2 - ||dq||^2) * (dq' . v')
    weighted by the acceptance probability, pooled over chains, fed to Adam
    on log tau;
  - step size adapts by pooled dual averaging as elsewhere.

Used by `sample` (standalone warmup) and by
`gptools_tpu.infer.pipeline.smc_then_chees` (SMC warm start).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gptools_tpu.infer import hmc as _hmc
from gptools_tpu.infer.hmc import SampleResult

__all__ = ["sample", "chees_step"]


def _halton(i: jax.Array, base: int = 2) -> jax.Array:
    """Radical-inverse halton sequence element in (0, 1), jit-safe."""
    # 16 bits is plenty for jitter purposes
    def body(k, carry):
        val, inv, idx = carry
        inv = inv / base
        digit = idx % base
        return (val + digit.astype(jnp.float32) * inv, inv, idx // base)

    val, _, _ = jax.lax.fori_loop(
        0, 16, body, (jnp.float32(0.0), jnp.float32(1.0), i + 1)
    )
    return val


class CheesState(NamedTuple):
    qs: jax.Array          # (C, P) positions
    logps: jax.Array       # (C,)
    grads: jax.Array       # (C, P)
    da: _hmc.DualAveragingState
    log_tau: jax.Array     # shared trajectory TIME (log)
    adam_m: jax.Array
    adam_v: jax.Array
    iteration: jax.Array
    key: jax.Array


def chees_step(
    logp_and_grad: Callable,
    state: CheesState,
    inv_mass: jax.Array,
    target_accept: float = 0.75,
    adapt: bool = True,
    adam_lr: float = 0.025,
    max_steps: int = 1024,
):
    """One vectorized ChEES-HMC iteration over all chains."""
    C, P = state.qs.shape
    dtype = state.qs.dtype
    key, k_mom, k_acc = jax.random.split(state.key, 3)

    eps = jnp.exp(state.da.log_eps if adapt else state.da.log_eps_avg)
    tau = jnp.exp(state.log_tau)
    h = _halton(state.iteration).astype(dtype)
    L = jnp.clip(
        jnp.ceil(h * tau / eps).astype(jnp.int32), 1, max_steps
    )

    p0 = jax.random.normal(k_mom, (C, P), dtype) / jnp.sqrt(inv_mass)

    def one_leap(carry, _):
        q, p, logp, g = carry
        q, p, logp, g = jax.vmap(
            lambda q_, p_, g_: _hmc.leapfrog(
                logp_and_grad, q_, p_, eps, inv_mass, grad=g_
            )
        )(q, p, g)
        return (q, p, logp, g), None

    # same L for every chain -> one while loop, no masked lanes
    def loop_body(i, carry):
        (q, p, logp, g), _ = one_leap(carry, None)
        return (q, p, logp, g)

    qn, pn, logpn, gn = jax.lax.fori_loop(
        0, L, loop_body, (state.qs, p0, state.logps, state.grads)
    )

    h0 = -state.logps + jax.vmap(lambda p_: _hmc.kinetic(p_, inv_mass))(p0)
    h1 = -logpn + jax.vmap(lambda p_: _hmc.kinetic(p_, inv_mass))(pn)
    log_accept = jnp.minimum(0.0, h0 - h1)
    log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
    accept_prob = jnp.exp(log_accept)
    accept = jnp.log(jax.random.uniform(k_acc, (C,), dtype)) < log_accept

    q_out = jnp.where(accept[:, None], qn, state.qs)
    logp_out = jnp.where(accept, logpn, state.logps)
    g_out = jnp.where(accept[:, None], gn, state.grads)

    # --- ChEES trajectory-length adaptation (pooled across chains) ---
    # diverged chains produce NaN endpoints; mask them out of every pooled
    # statistic or the adaptation (and then tau) is silently poisoned
    finite = jnp.all(jnp.isfinite(qn), axis=1) & jnp.isfinite(accept_prob)
    qn_safe = jnp.where(finite[:, None], qn, 0.0)
    n_fin = jnp.maximum(jnp.sum(finite.astype(dtype)), 1.0)
    mean_q = jnp.mean(state.qs, axis=0)    # psum-style cross-chain means
    mean_qn = jnp.sum(qn_safe, axis=0) / n_fin
    dq0 = state.qs - mean_q
    dq1 = qn_safe - mean_qn
    vel = jnp.where(finite[:, None], pn * inv_mass, 0.0)
    per_chain = (
        (jnp.sum(dq1 * dq1, axis=1) - jnp.sum(dq0 * dq0, axis=1))
        * jnp.sum(dq1 * vel, axis=1)
    )
    w = jnp.where(finite, accept_prob, 0.0)
    grad_tau = jnp.sum(w * per_chain) / jnp.maximum(jnp.sum(w), 1e-6)
    grad_tau = jnp.where(jnp.isfinite(grad_tau), grad_tau, 0.0)

    def adam_update(log_tau, m, v, g, t):
        b1, b2, eps_ = 0.9, 0.999, 1e-8
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (t + 1))
        vh = v / (1 - b2 ** (t + 1))
        return log_tau + adam_lr * mh / (jnp.sqrt(vh) + eps_), m, v

    t_f = state.iteration.astype(dtype)
    norm_g = grad_tau / (jnp.abs(grad_tau) + 1e-12) * jnp.minimum(
        jnp.abs(grad_tau), 1e3
    )  # clip exploding estimates
    if adapt:
        log_tau_new, m_new, v_new = adam_update(
            state.log_tau, state.adam_m, state.adam_v, norm_g, t_f
        )
        # keep tau within sane bounds relative to eps
        log_tau_new = jnp.clip(
            log_tau_new,
            jnp.log(eps),
            jnp.log(eps * max_steps),
        )
        da_new = _hmc.da_update(
            state.da, jnp.mean(accept_prob), target=target_accept
        )
    else:
        log_tau_new, m_new, v_new = state.log_tau, state.adam_m, state.adam_v
        da_new = state.da

    new_state = CheesState(
        qs=q_out,
        logps=logp_out,
        grads=g_out,
        da=da_new,
        log_tau=log_tau_new,
        adam_m=m_new,
        adam_v=v_new,
        iteration=state.iteration + 1,
        key=key,
    )
    stats = {
        "accept_prob": accept_prob,
        "diverged": (h1 - h0) > 1000.0,
        "num_leapfrog": L * jnp.ones((C,), jnp.int32),
        "eps": eps,
        "tau": jnp.exp(state.log_tau),
    }
    return new_state, (q_out, logp_out, stats)


def sample(
    logp: Callable,
    u0: jax.Array,
    key: jax.Array,
    num_warmup: int = 300,
    num_samples: int = 500,
    target_accept: float = 0.75,
    eps0: float = 0.1,
    tau0: Optional[float] = None,
    inv_mass0=None,
    max_steps: int = 1024,
    chunk: int = 25,
) -> SampleResult:
    """Vectorized ChEES-HMC: warmup (eps + tau + optional mass pooled
    adaptation), then frozen sampling. ``u0``: (C, P) initial positions."""
    u0 = jnp.atleast_2d(u0)
    C, P = u0.shape
    dtype = u0.dtype
    logp_and_grad = jax.value_and_grad(logp)

    inv_mass = (
        jnp.ones((P,), dtype)
        if inv_mass0 is None
        else jnp.asarray(inv_mass0, dtype)
    )
    logps, grads = jax.jit(jax.vmap(logp_and_grad))(u0)
    tau_init = float(tau0) if tau0 is not None else eps0 * 8.0

    state = CheesState(
        qs=u0,
        logps=logps,
        grads=grads,
        da=_hmc.da_init(jnp.asarray(eps0, dtype)),
        log_tau=jnp.log(jnp.asarray(tau_init, dtype)),
        adam_m=jnp.zeros((), dtype),
        adam_v=jnp.zeros((), dtype),
        iteration=jnp.zeros((), jnp.int32),
        key=key,
    )

    # Device calls are CHUNKED: one jitted scan of `chunk` iterations,
    # executed repeatedly from the host. Long-running single device programs
    # get killed by remote-TPU tunnels (observed with the axon plugin), and
    # chunking also reuses one compiled program for any warmup/sample count.
    chunk = max(1, int(chunk))

    @jax.jit
    def warm_chunk(state):
        def body(s, _):
            s, (q, lp, stats) = chees_step(
                logp_and_grad,
                s,
                inv_mass,
                target_accept=target_accept,
                adapt=True,
                max_steps=max_steps,
            )
            return s, stats["diverged"]

        return jax.lax.scan(body, state, None, length=chunk)

    @jax.jit
    def samp_chunk(state):
        def body(s, _):
            s, (q, lp, stats) = chees_step(
                logp_and_grad,
                s,
                inv_mass,
                target_accept=target_accept,
                adapt=False,
                max_steps=max_steps,
            )
            return s, (q, lp, stats)

        return jax.lax.scan(body, state, None, length=chunk)

    div_w = jnp.zeros((), jnp.int32)
    for _ in range(-(-num_warmup // chunk)):
        state, div = warm_chunk(state)
        div_w = div_w + jnp.sum(div).astype(jnp.int32)

    # freeze: use averaged step size
    eps_final = jnp.exp(state.da.log_eps_avg)
    state = state._replace(da=state.da._replace(log_eps=jnp.log(eps_final)))

    us_parts, lps_parts, acc_parts = [], [], []
    divergences = jnp.zeros((), jnp.int32)
    n_leap = jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)
    n_chunks = -(-num_samples // chunk)
    for _ in range(n_chunks):
        state, (us_c, lps_c, stats_c) = samp_chunk(state)
        us_parts.append(us_c)
        lps_parts.append(lps_c)
        acc_parts.append(stats_c["accept_prob"])
        divergences = divergences + jnp.sum(stats_c["diverged"]).astype(jnp.int32)
        n_leap = n_leap + jnp.sum(stats_c["num_leapfrog"]).astype(n_leap.dtype)

    us = jnp.concatenate(us_parts, axis=0)[:num_samples]
    lps = jnp.concatenate(lps_parts, axis=0)[:num_samples]
    accs = jnp.concatenate(acc_parts, axis=0)[:num_samples]

    u = jnp.swapaxes(us, 0, 1)
    log_prob = jnp.swapaxes(lps, 0, 1)
    diagnostics = {
        "step_size": eps_final,
        "trajectory_time": jnp.exp(state.log_tau),
        "inv_mass": inv_mass,
        "accept_prob": jnp.swapaxes(accs, 0, 1),
        "divergences": divergences,
        "divergences_warmup": div_w,
        "num_leapfrog_total": n_leap,
        "mean_accept": jnp.mean(accs),
    }
    return SampleResult(u=u, thetas=None, log_prob=log_prob, diagnostics=diagnostics)
