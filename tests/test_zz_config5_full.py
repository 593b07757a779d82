"""BASELINE config 5 as written — the 1024-chain nightly test, isolated.

This file exists (with a zz name) so the heaviest single test in the suite
collects LAST: the documented sporadic xdist worker crash
(docs/test_logs/README.md) then cannot poison the rest of the run's results
(VERDICT r4 weak #5). The fast set covers the identical code path at reduced
shape in tests/test_config5.py::test_config5_sharded_pipeline_reduced.
"""

import jax
import numpy as np
import pytest

from gptools_tpu import configs
from gptools_tpu.infer.pipeline import smc_then_chees
from gptools_tpu.parallel import make_mesh
from gptools_tpu.utils.diagnostics import split_rhat

from tests.test_config5 import _moments

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.mark.slow
def test_config5_sharded_pipeline_as_written(key):
    """The config-5 spec verbatim: 1024 chains, 100 warmup + 300 samples,
    line-integral observation, sharded over the mesh."""
    prob = configs.ALL_CONFIGS[5]()
    kw = dict(prob.sampler_kwargs)  # num_chains=1024, warmup=100, samples=300
    mesh = make_mesh(8)

    k_sh, k_ref = jax.random.split(key)
    res_sh = smc_then_chees(prob.model, prob.data, k_sh, mesh=mesh, **kw)
    res_ref = smc_then_chees(prob.model, prob.data, k_ref, **kw)

    m_sh, s_sh, e_sh, th_sh = _moments(res_sh)
    m_ref, s_ref, e_ref, _ = _moments(res_ref)

    # both runs must individually be healthy before comparing
    assert float(np.max(split_rhat(res_sh.thetas))) < 1.05
    assert float(np.max(split_rhat(res_ref.thetas))) < 1.05

    se = np.sqrt(s_sh**2 / e_sh + s_ref**2 / e_ref)
    z = np.abs(m_sh - m_ref) / se
    assert np.all(z < 5.0), f"posterior means disagree: z={z}"
    assert np.all(np.abs(s_sh - s_ref) <= 0.2 * s_ref + 5.0 * se), (
        f"posterior stds disagree: {s_sh} vs {s_ref}"
    )

    # the sampled state must actually be CHAIN-SHARDED, not merely spanning
    # devices: a fully-replicated array also spans all 8 devices, so check
    # that each device holds a strict slice of the chain axis
    assert not res_sh.u.sharding.is_fully_replicated
    shard = res_sh.u.addressable_shards[0]
    assert shard.data.shape[0] == kw["num_chains"] // 8
    assert th_sh.shape == (kw["num_chains"], kw["num_samples"], 5)
