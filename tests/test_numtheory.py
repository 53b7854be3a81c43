import numpy as np
import pytest

from homulator_tpu import numtheory as nt


def test_prime_generation():
    primes = nt.gen_ntt_primes(64, 8)
    assert len(set(primes)) == 8
    for q in primes:
        assert nt.is_prime(q)
        assert (q - 1) % 128 == 0
        assert (1 << nt.PRIME_MIN_BITS) < q < (1 << nt.PRIME_MAX_BITS)


def test_primitive_root():
    primes = nt.gen_ntt_primes(64, 3)
    for q in primes:
        psi = nt.find_primitive_2n_root(q, 64)
        assert pow(psi, 64, q) == q - 1
        assert pow(psi, 128, q) == 1


def test_mont_constants():
    for q in nt.gen_ntt_primes(32, 4):
        qinv_neg, r2, r1 = nt.mont_constants(q)
        assert (q * (nt.R - qinv_neg)) % nt.R == 1
        assert r2 == (1 << 64) % q
        assert r1 == (1 << 32) % q


def test_bit_reverse():
    assert nt.bit_reverse_perm(8) == [0, 4, 2, 6, 1, 5, 3, 7]
