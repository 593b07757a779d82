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

    warp -> pair covariance build (lower triangle only) -> jitter/noise ->
    unrolled Cholesky -> solves (w, alpha) -> L^{-1} -> K^{-1} at pairs ->
    analytic cotangent (dll/dK = (alpha alpha^T - K^{-1})/2, + jitter trace
    term) -> per-pair VJPs into theta

HBM traffic per call is just the operands: theta (P, C) in, (ll (C,),
grad (P, C)) out — a few hundred KB instead of hundreds of MB. Every
per-chain scalar is an (8, 128) f32 tile (1024 chains = one native VPU
tile), so no lane or sublane padding anywhere.

Static data (X, y, err^2, derivative orders) is baked into the kernel as
Python constants. That matches the engine's compiled-program caching
contract (`infer.pipeline._stable_fns`): programs are cached per
(model, data) and data arrays are jit constants in the traced density
already.

Model widening (VERDICT r4 missing #2) — mean functions, theta-dependent
diagonal noise, and input warps enter through AUXILIARY PER-POINT INPUTS,
each an (N, C) array computed OUTSIDE the kernel by ordinary XLA ops:

    mu  — the latent mean at each observation (any MeanFunction);
    nd  — the theta-dependent noise variance added to each diagonal entry
          (DiagonalNoiseKernel);
    w   — the warped coordinate w(x_i) (BetaWarp / any differentiable warp);
    wp  — the warp slope w'(x_i) (only when derivative observations exist:
          d/dx k(w(x), w(x')) = w'(x) * (d_1 k)).

The kernel consumes them tile-resident and emits dll/d(aux) alongside the
analytic theta-gradient (dll/dmu_i = alpha_i; dll/dnd_i = Kbar_ii including
the jitter trace term; dll/dw, dll/dwp via the per-pair VJPs). The outer
differentiable wrapper is a plain composition — JAX chains the kernel's
custom VJP with the XLA VJP of the aux computations (betainc quadrature,
mean autodiff), so ANY differentiable mean/warp composes exactly. The aux
traffic is N * C floats per array (~1.7 MB at the bench shape) — noise next
to the hundreds of MB the unfused path moves.

Pair kinds: 'se' (rows [sigma_f, l]), 'gibbs_tanh'
([sigma_f, l1, l2, lw, x0]; Gibbs is itself nonstationary so it composes
with mean/noise but not an input warp), and 'matern52' ([sigma_f, l] — the
closed k/k'/k'' forms are polynomial-times-exp in s = sqrt(5)|d|/l, smooth
at coincidence).

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
_SQRT5 = math.sqrt(5.0)

# one native f32 VPU tile of chains per grid step
_SUB, _LANES = 8, 128
_BLOCK = _SUB * _LANES

# Beyond this the fully-unrolled kernel body gets too large (instruction
# count grows ~N^3); the XLA chains-minor path takes over.
_N_MAX = 48

_KIND_PARAMS = {"se": 2, "gibbs_tanh": 5, "matern52": 2}


def supported(kind: str, n: int) -> bool:
    return kind in _KIND_PARAMS and n <= _N_MAX


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


def _se_pair(sf, ell, d, sel, sgn=0.0):
    """One SE covariance entry (d static float or a traced warped
    separation; ``sgn`` unused — SE needs no |d|)."""
    del sgn
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


def _matern52_pair(sf, ell, d, sel, sgn):
    """One Matern-5/2 covariance entry. ``sgn`` is the STATIC sign of the
    (unwarped) separation, so |d| = sgn * d stays exact when d is a traced
    warped separation (monotone warps preserve point order); the closed
    forms match `fused.matern52_blocks_d`."""
    ad = sgn * d
    s = (_SQRT5 / ell) * ad
    e = sf * sf * jnp.exp(-s)
    if sel == 0:
        return (1.0 + s + s * s * (1.0 / 3.0)) * e
    if sel == 3:
        return (5.0 / 3.0) / (ell * ell) * (1.0 + s - s * s) * e
    q = (5.0 / 3.0) * d / (ell * ell) * (1.0 + s) * e
    return -q if sel == 2 else q


_PAIR = {"se": _se_pair, "matern52": _matern52_pair}


def build_loglik_vag(
    kind: str,
    X,
    nid,
    y,
    err2,
    diag_factor: float,
    interpret: bool = False,
    *,
    has_mean: bool = False,
    has_noise: bool = False,
    warped: bool = False,
):
    """Build the fused evidence value-and-gradient kernel.

    Without aux flags (the r4 surface): ``f(thetaT (P, C)) ->
    (ll (C,), grad (P, C))``. With any of ``has_mean`` / ``has_noise`` /
    ``warped``: ``f(thetaT, aux) -> (ll, grad, aux_grads)`` where ``aux``
    is a dict of (N, C) arrays with keys among {'mu', 'nd', 'w', 'wp'}
    (wp required exactly when derivative observations exist) and
    ``aux_grads`` mirrors it with dll/d(aux).

    X/nid/y/err2 are HOST arrays (numpy); they become kernel constants.
    ``kind``: 'se' / 'matern52' (theta rows [sigma_f, l]) or 'gibbs_tanh'
    ([sigma_f, l1, l2, lw, x0]; cannot be input-warped). nid entries must
    be in {0, 1}.
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
    if warped and kind == "gibbs_tanh":
        raise ValueError("gibbs_tanh cannot be input-warped")
    P = _KIND_PARAMS[kind]
    df = float(diag_factor)
    slope_present = bool((nid == 1).any())

    aux_names = []
    if has_mean:
        aux_names.append("mu")
    if has_noise:
        aux_names.append("nd")
    if warped:
        aux_names.append("w")
        if slope_present:
            aux_names.append("wp")
    n_aux = len(aux_names)

    # static lower-triangle pair table: (i, j, d = x_i - x_j, sel) + signs
    pairs = [
        (i, j, float(X[i] - X[j]), int(2 * nid[i] + nid[j]))
        for i in range(n)
        for j in range(i + 1)
    ]
    sgns = [float(np.sign(d)) for (_, _, d, _) in pairs]

    def kernel(*refs):
        th_ref = refs[0]
        aux_refs = dict(zip(aux_names, refs[1 : 1 + n_aux]))
        ll_ref = refs[1 + n_aux]
        grad_ref = refs[2 + n_aux]
        gaux_refs = dict(zip(aux_names, refs[3 + n_aux :]))
        dtype = th_ref.dtype
        eps = float(jnp.finfo(dtype).eps)
        th = [th_ref[p] for p in range(P)]  # each (8, 128)
        aux = {
            name: [aux_refs[name][i] for i in range(n)] for name in aux_names
        }

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
        elif warped:
            sf, ell = th
            w = aux["w"]
            wp = aux.get("wp")

            if slope_present:

                def pair_fn(p, sfv, ops):
                    _, _, _, sel = pairs[p]
                    ellv, wi, wj, wpi, wpj = ops
                    v = _PAIR[kind](sfv, ellv, wi - wj, sel, sgns[p])
                    if sel == 2:
                        v = v * wpi
                    elif sel == 1:
                        v = v * wpj
                    elif sel == 3:
                        v = v * (wpi * wpj)
                    return v

                def pair_operands(p):
                    i, j, _, _ = pairs[p]
                    return (ell, w[i], w[j], wp[i], wp[j])

            else:

                def pair_fn(p, sfv, ops):
                    _, _, _, sel = pairs[p]
                    ellv, wi, wj = ops
                    return _PAIR[kind](sfv, ellv, wi - wj, sel, sgns[p])

                def pair_operands(p):
                    i, j, _, _ = pairs[p]
                    return (ell, w[i], w[j])

        else:
            sf, ell = th

            def pair_fn(p, sfv, ops):
                _, _, d, sel = pairs[p]
                return _PAIR[kind](sfv, ops, d, sel, sgns[p])

            def pair_operands(p):
                return ell

        # ---- forward build: lower-triangle pairs -------------------------
        K = {}
        for p, (i, j, _, _) in enumerate(pairs):
            K[(i, j)] = pair_fn(p, sf, pair_operands(p))

        # relative jitter on the OBSERVED diag (matches evidence._add_jitter_b:
        # scale is the mean diagonal of K + noise + err^2)
        diag = [K[(i, i)] + float(err2[i]) for i in range(n)]
        if has_noise:
            diag = [diag[i] + aux["nd"][i] for i in range(n)]
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
        w_s = []
        for i in range(n):
            s = jnp.full_like(sf, float(y[i]))
            if has_mean:
                s = s - aux["mu"][i]
            for k in range(i):
                s = s - L[(i, k)] * w_s[k]
            w_s.append(s / L[(i, i)])
        alpha = [None] * n
        for i in reversed(range(n)):
            s = w_s[i]
            for k in range(i + 1, n):
                s = s - L[(k, i)] * alpha[k]
            alpha[i] = s / L[(i, i)]

        quad = sum(wi * wi for wi in w_s)
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
        elif warped:
            w_bar = [jnp.zeros_like(sf) for _ in range(n)]
            wp_bar = [jnp.zeros_like(sf) for _ in range(n)]
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
            elif warped:
                if slope_present:
                    dell, dwi, dwj, dwpi, dwpj = dops
                    wp_bar[i] = wp_bar[i] + dwpi
                    wp_bar[j] = wp_bar[j] + dwpj
                else:
                    dell, dwi, dwj = dops
                acc[1] = acc[1] + dell
                w_bar[i] = w_bar[i] + dwi
                w_bar[j] = w_bar[j] + dwj
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
        for name in aux_names:
            ref = gaux_refs[name]
            if name == "mu":
                # ll = -1/2 r^T K^-1 r + ...; r = y - mu  =>  dll/dmu = alpha
                vals = alpha
            elif name == "nd":
                # the noise variance adds to K_ii, so its cotangent is the
                # diagonal dll/dK_ii including the jitter trace term
                vals = [kbar_diag[i] + corr for i in range(n)]
            elif name == "w":
                vals = w_bar
            else:  # "wp"
                vals = wp_bar
            for i in range(n):
                ref[i] = jnp.where(ok, vals[i], zero)

    def call(thetaT, aux=None):
        thetaT = jnp.atleast_2d(thetaT)
        C = thetaT.shape[1]
        Cp = -(-C // _BLOCK) * _BLOCK
        aux = dict(aux or {})
        if set(aux) != set(aux_names):
            raise ValueError(
                f"aux keys {sorted(aux)} != expected {sorted(aux_names)}"
            )
        if Cp != C:
            # pad with the last chain's values (finite, PSD-safe garbage)
            pad = jnp.broadcast_to(thetaT[:, -1:], (P, Cp - C))
            thetaT = jnp.concatenate([thetaT, pad], axis=1)
            for name in aux_names:
                a = aux[name]
                aux[name] = jnp.concatenate(
                    [a, jnp.broadcast_to(a[:, -1:], (n, Cp - C))], axis=1
                )
        G = Cp // _BLOCK
        dtype = thetaT.dtype
        mem = pl.ANY if interpret else pltpu.VMEM

        def spec(rows):
            return pl.BlockSpec(
                (rows, _SUB, _LANES), lambda i: (0, i, 0), memory_space=mem
            )

        inputs = [thetaT.reshape(P, G * _SUB, _LANES)] + [
            aux[name].astype(dtype).reshape(n, G * _SUB, _LANES)
            for name in aux_names
        ]
        ll3, grad3, *gaux3 = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[spec(P)] + [spec(n)] * n_aux,
            out_specs=[
                pl.BlockSpec(
                    (_SUB, _LANES), lambda i: (i, 0), memory_space=mem
                ),
                spec(P),
            ]
            + [spec(n)] * n_aux,
            out_shape=[
                jax.ShapeDtypeStruct((G * _SUB, _LANES), dtype),
                jax.ShapeDtypeStruct((P, G * _SUB, _LANES), dtype),
            ]
            + [
                jax.ShapeDtypeStruct((n, G * _SUB, _LANES), dtype)
                for _ in range(n_aux)
            ],
            interpret=interpret,
            # the unrolled body's live tiles scale ~3 * N(N+1)/2 * 4 KB
            # (K + L + Z dictionaries): N = 27 sits just under Mosaic's
            # default 16 MB scoped-vmem limit, N = 35 (config 3) exceeds it
            # by 408 KB (measured r5, v5e). Raise the cap — v5e has 128 MB
            # VMEM and the kernel's I/O blocks are a few hundred KB, so
            # there is ample headroom up to _N_MAX = 48 (~31 MB).
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        )(*inputs)
        ll = ll3.reshape(Cp)[:C]
        grad = grad3.reshape(P, Cp)[:, :C]
        if not aux_names:
            return ll, grad
        gaux = {
            name: g3.reshape(n, Cp)[:, :C]
            for name, g3 in zip(aux_names, gaux3)
        }
        return ll, grad, gaux

    call.aux_names = tuple(aux_names)
    return call


@functools.lru_cache(maxsize=32)
def _cached_loglik_theta(kind, x_key, nid_key, y_key, err2_key, df, interpret,
                         has_mean, has_noise, warped):
    vag = build_loglik_vag(
        kind,
        np.asarray(x_key),
        np.asarray(nid_key),
        np.asarray(y_key),
        np.asarray(err2_key),
        df,
        interpret=interpret,
        has_mean=has_mean,
        has_noise=has_noise,
        warped=warped,
    )

    if not vag.aux_names:

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

    @jax.custom_vjp
    def f(thetaT, aux):
        return vag(thetaT, aux)[0]

    def fwd(thetaT, aux):
        ll, grad, gaux = vag(thetaT, aux)
        return ll, (grad, gaux)

    def bwd(res, g):
        grad, gaux = res
        return (
            g[None, :] * grad,
            {name: g[None, :] * v for name, v in gaux.items()},
        )

    f.defvjp(fwd, bwd)
    f.vag = vag
    return f


def make_loglik_theta(kind, X, nid, y, err2, diag_factor, interpret=False, *,
                      has_mean=False, has_noise=False, warped=False):
    """Differentiable fused evidence whose VJP is the kernel's analytic
    gradient (the forward pass already computed it; the backward is one
    multiply per operand). Without aux flags: ``f(thetaT (P, C)) -> ll``;
    with them: ``f(thetaT, aux_dict) -> ll`` where the aux cotangents flow
    back through whatever XLA computation produced them (mean autodiff,
    betainc quadrature, ...). Cached on the static data so repeated
    pipeline invocations reuse the compiled kernel (same contract as
    `infer.chees._build_programs`); ``f.vag.aux_names`` lists the expected
    aux keys."""
    key = (
        kind,
        tuple(np.asarray(X, np.float64).reshape(-1).tolist()),
        tuple(np.asarray(nid, np.int64).reshape(-1).tolist()),
        tuple(np.asarray(y, np.float64).reshape(-1).tolist()),
        tuple(np.asarray(err2, np.float64).reshape(-1).tolist()),
        float(diag_factor),
        bool(interpret),
        bool(has_mean),
        bool(has_noise),
        bool(warped),
    )
    return _cached_loglik_theta(*key)
