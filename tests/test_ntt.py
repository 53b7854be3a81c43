"""NTT correctness: reference vs naive evaluation; device vs reference bit-exact."""

import jax.numpy as jnp
import numpy as np
import pytest

from homulator_tpu.refimpl import RefCkks

from .conftest import random_limbs


def _naive_eval(params, x_row, prime_idx, positions):
    """Negacyclic NTT by direct evaluation at psi^(2k+1) for eval-order slots."""
    q, psi = params.qs[prime_idx], params.psis[prime_idx]
    out = {}
    for pos in positions:
        k = int(params.ntt.eval_index[pos])
        out[pos] = (
            sum(
                int(x_row[j]) * pow(psi, ((2 * k + 1) * j) % (2 * params.n), q)
                for j in range(params.n)
            )
            % q
        )
    return out


@pytest.mark.parametrize("fixture", ["small_params", "medium_params"])
def test_ref_ntt_vs_naive(fixture, request):
    params = request.getfixturevalue(fixture)
    ref = RefCkks(params, seed=0)
    rng = np.random.default_rng(5)
    idx = np.arange(3)
    x = random_limbs(params, idx, rng)
    y = ref.ntt(x, idx)
    positions = list(range(0, params.n, max(1, params.n // 16)))
    for t in range(3):
        naive = _naive_eval(params, x[t], t, positions)
        for pos in positions:
            assert int(y[t, pos]) == naive[pos]


@pytest.mark.parametrize("fixture", ["small_params", "medium_params"])
def test_ref_intt_inverts(fixture, request):
    params = request.getfixturevalue(fixture)
    ref = RefCkks(params, seed=0)
    rng = np.random.default_rng(6)
    idx = np.arange(params.num_primes)
    x = random_limbs(params, idx, rng)
    assert np.array_equal(ref.intt(ref.ntt(x, idx), idx), x)


def test_eval_index_is_permutation(small_params):
    ei = small_params.ntt.eval_index
    assert sorted(ei.tolist()) == list(range(small_params.n))
    assert np.array_equal(small_params.ntt.eval_pos[ei], np.arange(small_params.n))


@pytest.mark.parametrize("fixture", ["small_engine", "medium_engine"])
def test_device_ntt_bit_exact(fixture, request):
    eng = request.getfixturevalue(fixture)
    params = eng.params
    rng = np.random.default_rng(7)
    level = params.max_level
    idx = np.arange(level)
    x = random_limbs(params, idx, rng)
    xd = jnp.asarray(x.astype(np.uint32))
    yd = np.asarray(eng.ntt(xd, level)).astype(np.uint64)
    assert np.array_equal(yd, eng.ref.ntt(x, idx))
    back = np.asarray(eng.intt(jnp.asarray(yd.astype(np.uint32)), level)).astype(np.uint64)
    assert np.array_equal(back, x)


def test_pointwise_mult_is_negacyclic_convolution(small_params):
    """NTT domain products implement X^n+1 polynomial multiplication."""
    params = small_params
    ref = RefCkks(params, seed=0)
    rng = np.random.default_rng(8)
    idx = np.arange(2)
    a = random_limbs(params, idx, rng)
    b = random_limbs(params, idx, rng)
    prod = ref.intt(ref.modmul(ref.ntt(a, idx), ref.ntt(b, idx), idx), idx)
    n = params.n
    for t in range(2):
        q = params.qs[t]
        conv = [0] * n
        for i in range(n):
            ai = int(a[t, i])
            for j in range(n):
                k, sgn = (i + j, 1) if i + j < n else (i + j - n, -1)
                conv[k] = (conv[k] + sgn * ai * int(b[t, j])) % q
        assert [int(v) for v in prod[t]] == conv
