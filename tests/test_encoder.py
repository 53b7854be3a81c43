"""Slot encoding: roundtrip, homomorphic slotwise semantics, slot rotation."""

import numpy as np
import pytest

from homulator_tpu.encoder import CkksEncoder

SCALE = 2.0**29


def test_encode_decode_roundtrip():
    enc = CkksEncoder(64)
    rng = np.random.default_rng(0)
    v = rng.normal(size=32) + 1j * rng.normal(size=32)
    coeffs = enc.encode(v, SCALE)
    back = enc.decode(coeffs, SCALE)
    assert np.max(np.abs(back - v)) < 1e-6


def test_encrypt_decrypt_slots(small_engine):
    eng = small_engine
    slots = eng.params.n // 2
    rng = np.random.default_rng(1)
    v = rng.normal(size=slots) + 1j * rng.normal(size=slots)
    ct = eng.encrypt_complex(v, eng.params.max_level, SCALE)
    back = eng.decrypt_complex(ct)
    assert np.max(np.abs(back - v)) < 1e-4


def test_hmult_is_slotwise_product(small_engine):
    eng = small_engine
    slots = eng.params.n // 2
    rng = np.random.default_rng(2)
    v1 = rng.normal(size=slots)
    v2 = rng.normal(size=slots)
    l = eng.params.max_level
    ct1 = eng.encrypt_complex(v1, l, SCALE)
    ct2 = eng.encrypt_complex(v2, l, SCALE)
    out = eng.decrypt_complex(eng.hmult(ct1, ct2))
    assert np.max(np.abs(out - v1 * v2)) < 1e-2


def test_pmult_is_slotwise_product(small_engine):
    eng = small_engine
    slots = eng.params.n // 2
    rng = np.random.default_rng(3)
    v1 = rng.normal(size=slots)
    v2 = rng.normal(size=slots)
    l = eng.params.max_level
    ct = eng.encrypt_complex(v1, l, SCALE)
    pt = eng.plaintext_complex(v2, l, SCALE)
    out_ct = eng.pmult(ct, pt)
    out = eng.decrypt_complex(out_ct)
    assert np.max(np.abs(out - v1 * v2)) < 1e-2


def test_hadd_is_slotwise_sum(small_engine):
    eng = small_engine
    slots = eng.params.n // 2
    rng = np.random.default_rng(4)
    v1 = rng.normal(size=slots)
    v2 = rng.normal(size=slots)
    l = eng.params.max_level
    ct1 = eng.encrypt_complex(v1, l, SCALE)
    ct2 = eng.encrypt_complex(v2, l, SCALE)
    out = eng.decrypt_complex(eng.hadd(ct1, ct2))
    assert np.max(np.abs(out - (v1 + v2))) < 1e-4


def test_hrotate_rotates_slots(small_engine):
    """hrotate by `step` maps slot j to value of slot j+step (left rotation)."""
    eng = small_engine
    slots = eng.params.n // 2
    v = np.arange(slots, dtype=np.float64)
    l = eng.params.max_level
    ct = eng.encrypt_complex(v, l, SCALE)
    for step in (1, 3):
        out = eng.decrypt_complex(eng.hrotate(ct, step))
        expected = np.roll(v, -step)
        assert np.max(np.abs(out - expected)) < 1e-2, step
