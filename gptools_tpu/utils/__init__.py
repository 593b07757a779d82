"""Utility layer: hyperpriors, bijectors, chain diagnostics, checkpointing.

TPU-native counterpart of the reference's ``gptools/utils.py`` (priors,
combinatorics, sampler summaries — see SURVEY.md section 2.1). The
combinatorial machinery (``incomplete_bell_poly``, ``generate_set_partitions``,
``fixed_poch``) is intentionally absent: its only purpose in the reference was
hand-assembled high-order kernel derivatives, which this rebuild obtains from
JAX autodiff (see `gptools_tpu.ops.derivs`).
"""
