"""Combinatorial helpers matching the reference's derivative machinery
(``gptools/utils.py :: incomplete_bell_poly, generate_set_partitions,
generate_set_partition_strings, fixed_poch`` — SURVEY.md section 2.1).

In this rebuild the covariance-derivative hot path never calls these: mixed
partial derivatives of kernels come from JAX autodiff (`gptools_tpu.ops.derivs`),
which is the single biggest simplification over the reference's hand-assembled
Faa di Bruno formula. They are provided as host-side numpy utilities for API
parity, for validating the autodiff derivative towers against the classical
combinatorial expansion, and for users who ported reference code that calls
them directly. None of them are jittable and none belong inside a trace.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "incomplete_bell_poly",
    "generate_set_partition_strings",
    "generate_set_partitions",
    "fixed_poch",
]


def incomplete_bell_poly(p, q, x):
    """Incomplete exponential Bell polynomial ``B_{p,q}(x_1, ..., x_{p-q+1})``.

    Role in the reference (``gptools/utils.py :: incomplete_bell_poly``): the
    Faa di Bruno expansion of ``d^p/dx^p f(g(x))`` used by ``ChainRuleKernel``
    to differentiate composed kernels. Here it exists for parity/validation
    only — `gptools_tpu.ops.derivs` gets the same derivatives from autodiff.

    Parameters
    ----------
    p, q : int
        Orders, ``p >= 0``, ``0 <= q <= p``.
    x : array_like
        Arguments ``x[0] = x_1, ..., x[p-q] = x_{p-q+1}``; longer arrays are
        fine (extra entries are unused). May carry a leading batch shape in
        its *last* axis semantics reversed: ``x`` is indexed on axis 0, any
        remaining axes broadcast (so vectorized evaluation over data points
        works the way the reference's did).

    Returns
    -------
    ndarray or float
        ``B_{p,q}`` evaluated elementwise over the trailing axes of ``x``.

    Notes
    -----
    Uses the standard recurrence

    ``B_{0,0} = 1;  B_{p,0} = 0 (p >= 1);  B_{0,q} = 0 (q >= 1)``
    ``B_{p,q} = sum_{k=1}^{p-q+1} C(p-1, k-1) x_k B_{p-k, q-1}``

    With all ``x_k = 1``, ``B_{p,q}`` is the Stirling number of the second
    kind ``S(p, q)`` (used as a test oracle).
    """
    p = int(p)
    q = int(q)
    if p < 0 or q < 0:
        raise ValueError("incomplete_bell_poly requires p >= 0 and q >= 0")
    x = np.asarray(x, dtype=float)
    if x.ndim == 0:
        x = x[None]
    tail = x.shape[1:]

    # B[j][m] over j in 0..p, m in 0..q, each an array of shape `tail`.
    zero = np.zeros(tail)
    one = np.ones(tail)
    B = [[zero for _ in range(q + 1)] for _ in range(p + 1)]
    B[0][0] = one
    for j in range(1, p + 1):
        # Only the B[j][m] with m >= q - (p - j) feed B[p][q]; restricting to
        # them also guarantees every x index stays within x_1..x_{p-q+1}.
        for m in range(max(1, q - (p - j)), min(j, q) + 1):
            acc = np.zeros(tail)
            for k in range(1, j - m + 2):
                if k - 1 >= x.shape[0]:
                    raise ValueError(
                        f"incomplete_bell_poly(p={p}, q={q}) needs x_1..x_"
                        f"{p - q + 1}; got only {x.shape[0]} entries"
                    )
                acc = acc + math.comb(j - 1, k - 1) * x[k - 1] * B[j - k][m - 1]
            B[j][m] = acc
    out = B[p][q]
    return out if tail else float(out)


def generate_set_partition_strings(n):
    """All restricted-growth strings of length ``n`` (one per set partition
    of ``{1..n}``), as lists of ints, in lexicographic order.

    Reference: ``gptools/utils.py :: generate_set_partition_strings`` (used to
    enumerate the partitions in the general Leibniz/Faa di Bruno products).
    The count is the Bell number ``B_n``.
    """
    n = int(n)
    if n < 0:
        raise ValueError("n must be >= 0")
    if n == 0:
        return []
    out = []

    def rec(prefix, max_seen):
        if len(prefix) == n:
            out.append(list(prefix))
            return
        for v in range(max_seen + 2):
            prefix.append(v)
            rec(prefix, max(max_seen, v))
            prefix.pop()

    rec([0], 0)
    return out


def generate_set_partitions(items):
    """All set partitions of ``items`` (a sequence), as lists of lists.

    Reference: ``gptools/utils.py :: generate_set_partitions``. Each partition
    lists its blocks in order of first appearance; there are Bell(n) of them.
    """
    items = list(items)
    if not items:
        return [[]]
    parts = []
    for s in generate_set_partition_strings(len(items)):
        nblocks = max(s) + 1
        blocks = [[] for _ in range(nblocks)]
        for item, b in zip(items, s):
            blocks[b].append(item)
        parts.append(blocks)
    return parts


def fixed_poch(a, n):
    """Pochhammer symbol ``(a)_n = Gamma(a+n)/Gamma(a)`` that stays finite at
    the gamma poles (``a`` a non-positive integer), matching the reference's
    ``gptools/utils.py :: fixed_poch`` behavior used in the general-nu Matern
    derivative recurrences.

    For integer ``n >= 0`` this is the rising factorial
    ``a (a+1) ... (a+n-1)`` computed as a direct product (exact at the poles,
    where the gamma-ratio form returns nan). Non-integer ``n`` falls back to
    the gamma ratio via ``scipy.special.poch``. Vectorized over ``a``.
    """
    a = np.asarray(a, dtype=float)
    if float(n) == int(n) and int(n) >= 0:
        n = int(n)
        out = np.ones_like(a)
        for k in range(n):
            out = out * (a + k)
        return out if out.ndim else float(out)
    from scipy.special import poch as _poch

    out = _poch(a, n)
    return out if np.ndim(out) else float(out)
