"""Checkpoint/resume: keys and ciphertexts roundtrip through disk."""

import numpy as np

from homulator_tpu import serialize
from homulator_tpu.refimpl import RefCkks


def test_key_roundtrip(tmp_path, small_params):
    ref = RefCkks(small_params, seed=9)
    ref.keygen()
    ref.gen_rotation_key(1)
    path = str(tmp_path / "keys.npz")
    serialize.save_keys(path, ref)

    ref2 = RefCkks(small_params, seed=999)
    serialize.load_keys(path, ref2)
    assert np.array_equal(ref.s_eval, ref2.s_eval)
    for d1, d2 in zip(ref.relin_key.digits, ref2.relin_key.digits):
        assert np.array_equal(d1, d2)
    assert np.array_equal(ref.rot_keys[1].digits[0], ref2.rot_keys[1].digits[0])

    # loaded keys actually decrypt
    scale = 2.0**29
    m = np.zeros(small_params.n, dtype=np.int64)
    m[0] = int(5 * scale)
    ct = ref.encrypt(ref.encode_ints(m, small_params.max_level, scale))
    dec = ref2.decrypt_to_bigint(ct, count=1)
    assert abs(dec[0] / scale - 5) < 1e-3


def test_ciphertext_roundtrip(tmp_path, small_engine):
    eng = small_engine
    scale = 2.0**29
    m = np.zeros(eng.params.n, dtype=np.int64)
    m[0] = int(3 * scale)
    ct = eng.encrypt_ints(m, eng.params.max_level, scale)
    path = str(tmp_path / "ct.npz")
    serialize.save_ciphertext(path, ct, eng.params)
    ct2 = serialize.load_ciphertext(path, eng.dc)
    assert np.array_equal(np.asarray(ct.data), np.asarray(ct2.data))
    assert (ct2.level, ct2.scale, ct2.domain) == (ct.level, ct.scale, ct.domain)
