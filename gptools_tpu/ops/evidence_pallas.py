"""Single-kernel Pallas evidence value-and-gradient for small-N GP posteriors.

The sampler hot path evaluates ``d log-evidence / d theta`` for thousands of
chains per leapfrog step. The XLA path (`ops.evidence.loglik_b` fed by
`ops.fused.flagship_cov_soa`) is mathematically tight but structurally
scattered: the unrolled build/factorization/solve/backward lower to hundreds
of small fused HLO kernels, each paying a launch and an HBM round-trip for
(N, N, C)-sized intermediates (~36 MB apiece at the bench shape N = 27,
C = 12288). At GP-hyperparameter sizes the arithmetic is tiny — the traffic
and launch overhead dominate.

This module instead emits ONE Pallas kernel per 1024-chain block that keeps
the ENTIRE evidence gradient VMEM-resident:

    warp -> pair covariance build (lower triangle only) -> jitter ->
    unrolled Cholesky -> solves (w, alpha) -> L^{-1} -> K^{-1} at pairs ->
    analytic cotangent (dll/dK = (alpha alpha^T - K^{-1})/2, + jitter trace
    term) -> per-pair VJP into theta

HBM traffic per call is just the operands: theta (P, C) in, (ll (C,),
grad (P, C)) out — a few hundred KB instead of hundreds of MB. Every
per-chain scalar is an (8, 128) f32 tile (1024 chains = one native VPU
tile), so no lane or sublane padding anywhere.

Static data (X, y, err^2, derivative orders) is baked into the kernel as
Python constants. That matches the engine's compiled-program caching
contract (`infer.pipeline._stable_fns`): programs are cached per
(model, data) and data arrays are jit constants in the traced density
already.

Semantics are pinned against `evidence.loglik_b` (same -inf-on-failure
contract, same relative-jitter trace term) in tests/test_evidence_pallas.py.

Reference counterpart: `gptools/core.py :: GaussianProcess.compute_K_L_alpha_ll`
(SURVEY.md section 3.1) — the reference's single hot path, here fused to a
single TPU kernel instead of a numpy -> LAPACK pipeline.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_loglik_vag", "make_loglik_theta", "supported"]

_LOG_2PI = math.log(2.0 * math.pi)

# one native f32 VPU tile of chains per grid step
_SUB, _LANES = 8, 128
_BLOCK = _SUB * _LANES

# Beyond this the fully-unrolled kernel body gets too large (instruction
# count grows ~N^3); the XLA chains-minor path takes over.
_N_MAX = 48


def supported(kind: str, n: int) -> bool:
    return kind in ("se", "gibbs_tanh") and n <= _N_MAX


def _gibbs_warp(l1, l2, lw, x0, x):
    """TanhWarp length-scale profile l(x), l'(x) (x a Python float)."""
    t = jnp.tanh((x - x0) / lw)
    l = l1 + 0.5 * (l2 - l1) * (1.0 + t)
    dl = 0.5 * (l2 - l1) * (1.0 - t * t) / lw
    return l, dl


def _gibbs_pair(sf, la, dla, lb, dlb, d, sel):
    """One lower-triangle Gibbs-tanh covariance entry; ``sel`` (static) picks
    the derivative block: 0 = value-value, 1 = value-slope (col deriv),
    2 = slope-value (row deriv), 3 = slope-slope. Only the selected block's
    math is emitted (value pairs skip the g-factor algebra entirely)."""
    u = la * la
    v = lb * lb
    S = u + v
    inv_S = 1.0 / S
    k = (sf * sf) * jnp.sqrt(2.0 * la * lb * inv_S) * jnp.exp(-(d * d) * inv_S)
    if sel == 0:
        return k
    up = 2.0 * la * dla
    vp = 2.0 * lb * dlb
    inv_S2 = inv_S * inv_S
    common = -0.5 * inv_S + (d * d) * inv_S2
    if sel == 2:
        g1 = up * (0.25 / u + common) - 2.0 * d * inv_S
        return g1 * k
    if sel == 1:
        g2 = vp * (0.25 / v + common) + 2.0 * d * inv_S
        return g2 * k
    g1 = up * (0.25 / u + common) - 2.0 * d * inv_S
    g2 = vp * (0.25 / v + common) + 2.0 * d * inv_S
    dg2dx = (
        vp * (0.5 * up * inv_S2 + 2.0 * d * inv_S2
              - 2.0 * (d * d) * up * inv_S2 * inv_S)
        + 2.0 * inv_S
        - 2.0 * d * up * inv_S2
    )
    return (g1 * g2 + dg2dx) * k


def _se_pair(sf, ell, d, sel):
    """One SE covariance entry (d static)."""
    inv_l2 = 1.0 / (ell * ell)
    r2 = (d * d) * inv_l2
    e = sf * sf * jnp.exp(-0.5 * r2)
    if sel == 0:
        return e
    if sel == 2:
        return -d * inv_l2 * e
    if sel == 1:
        return d * inv_l2 * e
    return (1.0 - r2) * inv_l2 * e


def build_loglik_vag(
    kind: str,
    X,
    nid,
    y,
    err2,
    diag_factor: float,
    interpret: bool = False,
):
    """Build ``f(thetaT (P, C)) -> (ll (C,), grad (P, C))`` as one fused
    Pallas kernel (value and full analytic theta-gradient in a single pass).

    X/nid/y/err2 are HOST arrays (numpy); they become kernel constants.
    ``kind``: 'se' (theta rows [sigma_f, l]) or 'gibbs_tanh'
    ([sigma_f, l1, l2, lw, x0]). nid entries must be in {0, 1}.
    """
    X = np.asarray(X, np.float64).reshape(-1)
    nid = np.asarray(nid, np.int64).reshape(-1)
    y = np.asarray(y, np.float64).reshape(-1)
    err2 = np.asarray(err2, np.float64).reshape(-1)
    n = X.shape[0]
    if not supported(kind, n):
        raise ValueError(f"unsupported ({kind}, N={n})")
    if not set(np.unique(nid)) <= {0, 1}:
        raise ValueError("nid entries must be 0 or 1")
    P = {"se": 2, "gibbs_tanh": 5}[kind]
    df = float(diag_factor)

    # static lower-triangle pair table: (i, j, d = x_i - x_j, sel)
    pairs = [
        (i, j, float(X[i] - X[j]), int(2 * nid[i] + nid[j]))
        for i in range(n)
        for j in range(i + 1)
    ]

    def kernel(th_ref, ll_ref, grad_ref):
        dtype = th_ref.dtype
        eps = float(jnp.finfo(dtype).eps)
        th = [th_ref[p] for p in range(P)]  # each (8, 128)

        if kind == "gibbs_tanh":
            sf, l1, l2, lw, x0 = th

            def point_vals(args):
                a, b, c, e = args
                return [_gibbs_warp(a, b, c, e, float(X[i])) for i in range(n)]

            warp_args = (l1, l2, lw, x0)
            pts, pts_vjp = jax.vjp(point_vals, warp_args)

            def pair_fn(p, sfv, ops):
                i, j, d, sel = pairs[p]
                (la, dla), (lb, dlb) = ops
                return _gibbs_pair(sfv, la, dla, lb, dlb, d, sel)

            def pair_operands(p):
                i, j, _, _ = pairs[p]
                return (pts[i], pts[j])
        else:
            sf, ell = th
            pts = None

            def pair_fn(p, sfv, ops):
                _, _, d, sel = pairs[p]
                return _se_pair(sfv, ops, d, sel)

            def pair_operands(p):
                return ell

        # ---- forward build: lower-triangle pairs -------------------------
        K = {}
        for p, (i, j, _, _) in enumerate(pairs):
            K[(i, j)] = pair_fn(p, sf, pair_operands(p))

        # relative jitter on the OBSERVED diag (matches evidence._add_jitter_b:
        # scale is the mean diagonal of K + err^2)
        diag = [K[(i, i)] + float(err2[i]) for i in range(n)]
        scale = sum(diag) * (1.0 / n)
        jitter = df * eps * jnp.maximum(scale, jnp.asarray(1.0, dtype))
        for i in range(n):
            K[(i, i)] = diag[i] + jitter

        # ---- unrolled Cholesky (chain axis = the (8, 128) tile) ----------
        L = {}
        for j in range(n):
            dd = K[(j, j)]
            col = {i: K[(i, j)] for i in range(j + 1, n)}
            for k in range(j):
                ljk = L[(j, k)]
                dd = dd - ljk * ljk
                for i in range(j + 1, n):
                    col[i] = col[i] - L[(i, k)] * ljk
            sq = jnp.sqrt(dd)
            L[(j, j)] = sq
            inv = 1.0 / sq
            for i in range(j + 1, n):
                L[(i, j)] = col[i] * inv

        # ---- solves ------------------------------------------------------
        w = []
        for i in range(n):
            s = jnp.full_like(sf, float(y[i]))
            for k in range(i):
                s = s - L[(i, k)] * w[k]
            w.append(s / L[(i, i)])
        alpha = [None] * n
        for i in reversed(range(n)):
            s = w[i]
            for k in range(i + 1, n):
                s = s - L[(k, i)] * alpha[k]
            alpha[i] = s / L[(i, i)]

        quad = sum(wi * wi for wi in w)
        logdet = sum(jnp.log(L[(i, i)]) for i in range(n))
        ll = -0.5 * quad - logdet - 0.5 * n * _LOG_2PI
        ok = jnp.isfinite(ll)

        # ---- analytic dll/dK at the lower-triangle pairs -----------------
        # Z = L^{-1} (column-by-column, exploiting the zero head of each col)
        Z = {}
        for j in range(n):
            Z[(j, j)] = 1.0 / L[(j, j)]
            for i in range(j + 1, n):
                s = -L[(i, j)] * Z[(j, j)]
                for k in range(j + 1, i):
                    s = s - L[(i, k)] * Z[(k, j)]
                Z[(i, j)] = s / L[(i, i)]

        def kinv(i, j):  # i >= j; K^{-1} = Z^T Z
            return sum(Z[(k, i)] * Z[(k, j)] for k in range(i, n))

        kbar_diag = [0.5 * (alpha[i] * alpha[i] - kinv(i, i)) for i in range(n)]
        tr = sum(kbar_diag)
        corr = jnp.where(scale > 1.0, (df * eps / n) * tr, jnp.zeros_like(tr))

        # ---- backward through the build (recompute-VJP per pair) ---------
        acc = [jnp.zeros_like(sf) for _ in range(P)]
        if kind == "gibbs_tanh":
            pt_bar = [
                (jnp.zeros_like(sf), jnp.zeros_like(sf)) for _ in range(n)
            ]
        for p, (i, j, _, _) in enumerate(pairs):
            if i == j:
                gbar = kbar_diag[i] + corr
            else:
                gbar = alpha[i] * alpha[j] - kinv(i, j)
            _, pull = jax.vjp(
                lambda sfv, ops, _p=p: pair_fn(_p, sfv, ops),
                sf,
                pair_operands(p),
            )
            dsf, dops = pull(gbar)
            acc[0] = acc[0] + dsf
            if kind == "gibbs_tanh":
                (dla, ddla), (dlb, ddlb) = dops
                la_b, dla_b = pt_bar[i]
                pt_bar[i] = (la_b + dla, dla_b + ddla)
                lb_b, dlb_b = pt_bar[j]
                pt_bar[j] = (lb_b + dlb, dlb_b + ddlb)
            else:
                acc[1] = acc[1] + dops
        if kind == "gibbs_tanh":
            (dwarp,) = pts_vjp(pt_bar)
            for q in range(4):
                acc[1 + q] = acc[1 + q] + dwarp[q]

        # ---- -inf-on-failure contract ------------------------------------
        neg_inf = jnp.full_like(ll, -jnp.inf)
        ll_ref[...] = jnp.where(ok, ll, neg_inf)
        zero = jnp.zeros_like(sf)
        for p in range(P):
            grad_ref[p] = jnp.where(ok, acc[p], zero)

    def call(thetaT):
        thetaT = jnp.atleast_2d(thetaT)
        C = thetaT.shape[1]
        Cp = -(-C // _BLOCK) * _BLOCK
        if Cp != C:
            # pad with the last chain's theta (finite, PSD-safe garbage)
            pad = jnp.broadcast_to(thetaT[:, -1:], (P, Cp - C))
            thetaT = jnp.concatenate([thetaT, pad], axis=1)
        G = Cp // _BLOCK
        th3 = thetaT.reshape(P, G * _SUB, _LANES)
        dtype = thetaT.dtype
        ll3, grad3 = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec(
                    (P, _SUB, _LANES),
                    lambda i: (0, i, 0),
                    memory_space=pl.ANY if interpret else pltpu.VMEM,
                )
            ],
            out_specs=[
                pl.BlockSpec(
                    (_SUB, _LANES),
                    lambda i: (i, 0),
                    memory_space=pl.ANY if interpret else pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (P, _SUB, _LANES),
                    lambda i: (0, i, 0),
                    memory_space=pl.ANY if interpret else pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((G * _SUB, _LANES), dtype),
                jax.ShapeDtypeStruct((P, G * _SUB, _LANES), dtype),
            ],
            interpret=interpret,
        )(th3)
        ll = ll3.reshape(Cp)[:C]
        grad = grad3.reshape(P, Cp)[:, :C]
        return ll, grad

    return call


@functools.lru_cache(maxsize=32)
def _cached_loglik_theta(kind, x_key, nid_key, y_key, err2_key, df, interpret):
    vag = build_loglik_vag(
        kind,
        np.asarray(x_key),
        np.asarray(nid_key),
        np.asarray(y_key),
        np.asarray(err2_key),
        df,
        interpret=interpret,
    )

    @jax.custom_vjp
    def f(thetaT):
        return vag(thetaT)[0]

    def fwd(thetaT):
        ll, grad = vag(thetaT)
        return ll, grad

    def bwd(grad, g):
        return (g[None, :] * grad,)

    f.defvjp(fwd, bwd)
    f.vag = vag  # expose the raw (ll, grad) call for tests/benches
    return f


def make_loglik_theta(kind, X, nid, y, err2, diag_factor, interpret=False):
    """Differentiable ``f(thetaT (P, C)) -> ll (C,)`` whose VJP is the fused
    kernel's analytic gradient (the forward pass already computed it; the
    backward is one multiply). Cached on the static data so repeated
    pipeline invocations reuse the compiled kernel (same contract as
    `infer.chees._build_programs`)."""
    key = (
        kind,
        tuple(np.asarray(X, np.float64).reshape(-1).tolist()),
        tuple(np.asarray(nid, np.int64).reshape(-1).tolist()),
        tuple(np.asarray(y, np.float64).reshape(-1).tolist()),
        tuple(np.asarray(err2, np.float64).reshape(-1).tolist()),
        float(diag_factor),
        bool(interpret),
    )
    return _cached_loglik_theta(*key)
