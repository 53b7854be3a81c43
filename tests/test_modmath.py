"""Device Montgomery arithmetic vs exact Python integers."""

import jax.numpy as jnp
import numpy as np

from homulator_tpu import numtheory as nt
from homulator_tpu.ops import modmath as mm


def _rand_pair(q, size, rng):
    a = rng.integers(0, q, size=size, dtype=np.uint64)
    b = rng.integers(0, q, size=size, dtype=np.uint64)
    return a, b


def test_mul32_full_product():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    hi, lo = mm.mul32(jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32)))
    full = a * b  # exact in uint64? no — use python ints
    for i in range(0, 1000, 37):
        exact = int(a[i]) * int(b[i])
        assert (int(np.asarray(hi)[i]) << 32) + int(np.asarray(lo)[i]) == exact


def test_mont_mul_matches_exact():
    rng = np.random.default_rng(1)
    for q in nt.gen_ntt_primes(64, 3):
        qinv_neg, r2, _ = nt.mont_constants(q)
        a, b = _rand_pair(q, 4096, rng)
        b_mont = (b.astype(object) * nt.R % q).astype(np.uint64)
        out = mm.mont_mul(
            jnp.asarray(a.astype(np.uint32)),
            jnp.asarray(b_mont.astype(np.uint32)),
            jnp.uint32(q),
            jnp.uint32(qinv_neg),
        )
        expected = (a.astype(object) * b.astype(object) % q).astype(np.uint64)
        assert np.array_equal(np.asarray(out).astype(np.uint64), expected)


def test_to_mont_roundtrip():
    rng = np.random.default_rng(2)
    q = nt.gen_ntt_primes(64, 1)[0]
    qinv_neg, r2, _ = nt.mont_constants(q)
    a = rng.integers(0, q, size=512, dtype=np.uint64)
    am = mm.to_mont(
        jnp.asarray(a.astype(np.uint32)), jnp.uint32(r2), jnp.uint32(q), jnp.uint32(qinv_neg)
    )
    expected = (a.astype(object) * nt.R % q).astype(np.uint64)
    assert np.array_equal(np.asarray(am).astype(np.uint64), expected)


def test_modadd_modsub_modneg():
    rng = np.random.default_rng(3)
    q = nt.gen_ntt_primes(64, 1)[0]
    a, b = _rand_pair(q, 2048, rng)
    qj = jnp.uint32(q)
    aj = jnp.asarray(a.astype(np.uint32))
    bj = jnp.asarray(b.astype(np.uint32))
    assert np.array_equal(np.asarray(mm.modadd(aj, bj, qj)).astype(np.uint64), (a + b) % q)
    assert np.array_equal(
        np.asarray(mm.modsub(aj, bj, qj)).astype(np.uint64), (a + q - b) % q
    )
    assert np.array_equal(np.asarray(mm.modneg(aj, qj)).astype(np.uint64), (q - a) % q)


def test_ewe_muladd():
    """The reference EWE's a*b + c*d mod q lane (InsGen.cpp:90-95)."""
    rng = np.random.default_rng(4)
    q = nt.gen_ntt_primes(64, 1)[0]
    qinv_neg, r2, _ = nt.mont_constants(q)
    a, b = _rand_pair(q, 1024, rng)
    c, d = _rand_pair(q, 1024, rng)
    bm = (b.astype(object) * nt.R % q).astype(np.uint64)
    dm = (d.astype(object) * nt.R % q).astype(np.uint64)
    out = mm.ewe_muladd(
        jnp.asarray(a.astype(np.uint32)), jnp.asarray(bm.astype(np.uint32)),
        jnp.asarray(c.astype(np.uint32)), jnp.asarray(dm.astype(np.uint32)),
        jnp.uint32(q), jnp.uint32(qinv_neg),
    )
    expected = (
        (a.astype(object) * b.astype(object) + c.astype(object) * d.astype(object)) % q
    ).astype(np.uint64)
    assert np.array_equal(np.asarray(out).astype(np.uint64), expected)


def test_mulhi32_approx_error_at_most_one():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 32, size=8192, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=8192, dtype=np.uint64)
    approx = np.asarray(
        mm.mulhi32_approx(
            jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32))
        )
    ).astype(np.uint64)
    exact = np.array([(int(x) * int(y)) >> 32 for x, y in zip(a, b)], dtype=np.uint64)
    err = exact - approx
    assert err.min() >= 0 and err.max() <= 1


def test_mont_mul_lazy_range_and_value():
    """mont_mul_lazy: result < 2q for ANY uint32 a, and ≡ a*b (mod q).
    Uses the largest generated prime (closest to PRIME_CAP — worst lazy
    range)."""
    rng = np.random.default_rng(9)
    q = nt.gen_ntt_primes(64, 1)[0]
    qinv_neg, r2, _ = nt.mont_constants(q)
    a = rng.integers(0, 1 << 32, size=8192, dtype=np.uint64)  # ANY uint32
    b = rng.integers(0, q, size=8192, dtype=np.uint64)
    b_mont = (b.astype(object) * nt.R % q).astype(np.uint64)
    out = np.asarray(
        mm.mont_mul_lazy(
            jnp.asarray(a.astype(np.uint32)),
            jnp.asarray(b_mont.astype(np.uint32)),
            jnp.uint32(q), jnp.uint32(qinv_neg),
        )
    ).astype(np.uint64)
    assert out.max() < 2 * q
    expected = (a.astype(object) * b.astype(object) % q).astype(np.uint64)
    assert np.array_equal(out % q, expected)


def test_lazy_sum_reduce_range_and_value():
    """lazy_sum_reduce over 1..8 terms each in [0, 2q): exact mod-q sum in
    [0, q), wrap-free at the largest generated prime."""
    rng = np.random.default_rng(10)
    q = nt.gen_ntt_primes(64, 1)[0]
    qj = jnp.uint32(q)
    for nterms in range(1, 9):  # covers dnum regimes up to 8 digits
        terms_np = [
            rng.integers(0, 2 * q, size=4096, dtype=np.uint64)
            for _ in range(nterms)
        ]
        out = np.asarray(
            mm.lazy_sum_reduce(
                [jnp.asarray(t.astype(np.uint32)) for t in terms_np], qj
            )
        ).astype(np.uint64)
        assert out.max() < q
        expected = sum(t.astype(object) for t in terms_np) % q
        assert np.array_equal(out, expected.astype(np.uint64))


def test_shoup_mul_lazy3_range_and_value():
    rng = np.random.default_rng(8)
    # Largest generated prime: closest to the 2^32/6 cap (worst lazy range).
    q = nt.gen_ntt_primes(64, 1)[0]
    assert 6 * q < 1 << 32, "PRIME_CAP must keep 6q wrap-free"
    w = int(rng.integers(1, q))
    wsh = (w << 32) // q
    a = rng.integers(0, 1 << 32, size=8192, dtype=np.uint64)  # ANY uint32
    out = np.asarray(
        mm.shoup_mul_lazy3(
            jnp.asarray(a.astype(np.uint32)), jnp.uint32(w), jnp.uint32(wsh),
            jnp.uint32(q),
        )
    ).astype(np.uint64)
    assert out.max() < 3 * q
    expected = (a.astype(object) * w % q).astype(np.uint64)
    assert np.array_equal(out % q, expected)
