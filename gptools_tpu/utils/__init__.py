"""Utility layer: hyperpriors, bijectors, chain diagnostics, checkpointing.

TPU-native counterpart of the reference's ``gptools/utils.py`` (priors,
combinatorics, sampler summaries — see SURVEY.md section 2.1). The
combinatorial machinery (``incomplete_bell_poly``, ``generate_set_partitions``,
``fixed_poch``) is intentionally absent: its only purpose in the reference was
hand-assembled high-order kernel derivatives, which this rebuild obtains from
JAX autodiff (see `gptools_tpu.ops.derivs`).
"""


def unique_rows(arr):
    """Unique rows of a 2-D array, preserving first-occurrence order
    (``gptools/utils.py :: unique_rows``). Host-side numpy helper."""
    import numpy as _np

    a = _np.asarray(arr)
    if a.ndim != 2:
        raise ValueError("unique_rows expects a 2-D array")
    _, idx = _np.unique(a, axis=0, return_index=True)
    return a[_np.sort(idx)]
