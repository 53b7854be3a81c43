"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(the reference's multi-cluster-without-a-cluster testing mode, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from homulator_tpu.api import CkksEngine, hmult_graph
from homulator_tpu.params import get_params
from homulator_tpu.parallel.mesh import make_mesh
from homulator_tpu.parallel.sharded import make_sharded_hmult

SCALE = 2.0**29


@pytest.fixture(scope="module")
def shard_engine():
    params = get_params(n=256, max_level=8, alpha=4)
    eng = CkksEngine(params, seed=5, ntt_mode="jnp")
    eng.keygen()
    return eng


def _batch(eng, level, B, seed):
    rng = np.random.default_rng(seed)
    p = eng.params
    cts = []
    for _ in range(B):
        m = np.zeros(p.n, dtype=np.int64)
        m[0] = int(rng.normal() * SCALE)
        cts.append(eng.encrypt_ints(m, level, SCALE))
    return jnp.stack([c.data for c in cts])


@pytest.mark.parametrize("shape", [(1, 4), (2, 4), (4, 2), (8, 1)])
def test_sharded_hmult_matches_single_chip(shard_engine, shape):
    eng = shard_engine
    level = 8
    n_dev = shape[0] * shape[1]
    if n_dev > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(shape=shape, n_devices=n_dev)
    B = max(2, shape[0])
    a_batch = _batch(eng, level, B, seed=1)
    b_batch = _batch(eng, level, B, seed=2)

    ct_shard = NamedSharding(mesh, P("data", None, "limb", None))
    evk_shard = NamedSharding(mesh, P(None, None, "limb", None))
    a_s = jax.device_put(a_batch, ct_shard)
    b_s = jax.device_put(b_batch, ct_shard)
    evk_s = jax.device_put(eng.relin_key, evk_shard)

    f = make_sharded_hmult(eng.dc, level, mesh)
    out = np.asarray(f(a_s, b_s, evk_s))

    dc = eng.dc
    kt = dc.keyswitch_tables(level)
    last_nt = dc.ntt_basis((level - 1,))
    out_nt = dc.ntt_basis(dc.main_rows(level - 1))
    rs = dc.rescale_qinv_mont(level)
    for i in range(B):
        ref = np.asarray(
            hmult_graph(a_batch[i], b_batch[i], eng.relin_key, kt, last_nt, out_nt, rs)
        )
        assert np.array_equal(out[i], ref), f"batch {i} mismatch at mesh {shape}"


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
