"""Operation-level tests: device bit-exact vs CPU reference + end-to-end
homomorphic correctness through decrypt (the tests the reference never had,
SURVEY.md §4)."""

import numpy as np
import pytest

from homulator_tpu.refimpl import RefCiphertext, RefPlaintext

SCALE = 2.0**29


def _enc_pair(eng, v1, v2, level):
    n = eng.params.n
    m1 = np.zeros(n, dtype=np.int64)
    m2 = np.zeros(n, dtype=np.int64)
    m1[0] = int(v1 * SCALE)
    m2[0] = int(v2 * SCALE)
    return eng.encrypt_ints(m1, level, SCALE), eng.encrypt_ints(m2, level, SCALE)


def _flat(dev_data) -> np.ndarray:
    """Device tiles [..., R, C] -> host flat [..., N] uint64."""
    h = np.asarray(dev_data).astype(np.uint64)
    return h.reshape(h.shape[:-2] + (h.shape[-2] * h.shape[-1],))


def _mirror(ct):
    return RefCiphertext(_flat(ct.data), ct.level, ct.scale)


@pytest.mark.parametrize("fixture", ["small_engine", "medium_engine"])
class TestBitExact:
    def test_hadd(self, fixture, request):
        eng = request.getfixturevalue(fixture)
        l = eng.params.max_level
        ct1, ct2 = _enc_pair(eng, 3, 4, l)
        out = eng.hadd(ct1, ct2)
        ref_out = eng.ref.hadd(_mirror(ct1), _mirror(ct2))
        assert np.array_equal(_flat(out.data), ref_out.data)

    def test_pmult_padd(self, fixture, request):
        eng = request.getfixturevalue(fixture)
        l = eng.params.max_level
        ct1, _ = _enc_pair(eng, 3, 4, l)
        coeffs = np.zeros(eng.params.n, dtype=np.int64)
        coeffs[:4] = [5, -1, 2, 7]
        pt = eng.plaintext_ints(coeffs, l, 1.0)
        rpt = RefPlaintext(_flat(pt.data), l, 1.0)
        assert np.array_equal(
            _flat(eng.pmult(ct1, pt).data),
            eng.ref.pmult(_mirror(ct1), rpt).data,
        )
        assert np.array_equal(
            _flat(eng.padd(ct1, pt).data),
            eng.ref.padd(_mirror(ct1), rpt).data,
        )

    def test_hmult(self, fixture, request):
        eng = request.getfixturevalue(fixture)
        l = eng.params.max_level
        ct1, ct2 = _enc_pair(eng, 3, 4, l)
        out = eng.hmult(ct1, ct2)
        ref_out = eng.ref.hmult(_mirror(ct1), _mirror(ct2))
        assert out.level == l - 1
        assert np.array_equal(_flat(out.data), ref_out.data)

    def test_hmult_lower_level(self, fixture, request):
        """Exercises partial digits at a level not divisible by alpha."""
        eng = request.getfixturevalue(fixture)
        l = eng.params.max_level - 1
        ct1, ct2 = _enc_pair(eng, 2, 5, l)
        out = eng.hmult(ct1, ct2)
        ref_out = eng.ref.hmult(_mirror(ct1), _mirror(ct2))
        assert np.array_equal(_flat(out.data), ref_out.data)

    def test_hrotate(self, fixture, request):
        eng = request.getfixturevalue(fixture)
        l = eng.params.max_level
        ct1, _ = _enc_pair(eng, 3, 4, l)
        out = eng.hrotate(ct1, 1)
        ref_out = eng.ref.hrotate(_mirror(ct1), 1)
        assert np.array_equal(_flat(out.data), ref_out.data)

    def test_rescale(self, fixture, request):
        eng = request.getfixturevalue(fixture)
        l = eng.params.max_level
        ct1, _ = _enc_pair(eng, 3, 4, l)
        out = eng.rescale(ct1)
        ref_out = eng.ref.rescale(_mirror(ct1))
        assert out.level == l - 1
        assert np.array_equal(_flat(out.data), ref_out.data)


class TestHomomorphic:
    """End-to-end: operations compute the right numbers after decryption."""

    def test_hmult_product(self, small_engine):
        eng = small_engine
        l = eng.params.max_level
        ct1, ct2 = _enc_pair(eng, 7, 11, l)
        out = eng.hmult(ct1, ct2)
        dec = eng.decrypt_bigint(out)
        assert abs(dec[0] / out.scale - 77) < 0.01

    def test_hmult_chain(self, small_engine):
        """Multiply down several levels: ((2*3)*4) = 24."""
        eng = small_engine
        l = eng.params.max_level
        ct1, ct2 = _enc_pair(eng, 2, 3, l)
        prod = eng.hmult(ct1, ct2)
        n = eng.params.n
        m3 = np.zeros(n, dtype=np.int64)
        m3[0] = int(4 * prod.scale)
        ct3 = eng.encrypt_ints(m3, prod.level, prod.scale)
        prod2 = eng.hmult(prod, ct3)
        dec = eng.decrypt_bigint(prod2)
        assert abs(dec[0] / prod2.scale - 24) < 0.05

    def test_hadd_sum(self, small_engine):
        eng = small_engine
        l = eng.params.max_level
        ct1, ct2 = _enc_pair(eng, 7, 11, l)
        dec = eng.decrypt_bigint(eng.hadd(ct1, ct2))
        assert abs(dec[0] / SCALE - 18) < 0.001

    def test_hrotate_is_coeff_automorphism(self, small_engine):
        """Decrypting a rotation yields sigma_g applied to the plaintext poly."""
        eng = small_engine
        p = eng.params
        l = p.max_level
        rng = np.random.default_rng(9)
        m = np.zeros(p.n, dtype=np.int64)
        m[: p.n] = rng.integers(-1000, 1000, size=p.n) * 1000
        ct = eng.encrypt_ints(m, l, SCALE)
        out = eng.hrotate(ct, 2)
        dec = np.array(eng.decrypt_bigint(out))
        g = p.galois_elt(2)
        src, neg = p.automorph_coeff_maps(g)
        expected = np.where(neg, -m[src], m[src])
        assert np.max(np.abs(dec - expected)) < 1e6  # keyswitch noise << SCALE


def test_hrotate_hoisted_matches_individual(small_engine):
    """Hoisted multi-rotation decrypts to the same values as per-step
    hrotate (not bit-identical: applying sigma after the approximate
    CRT lift changes which Q_d-multiple rides along — same semantics,
    equivalent noise)."""
    eng = small_engine
    p = eng.params
    l = p.max_level
    slots = p.n // 2
    v = np.arange(slots, dtype=np.float64)
    ct = eng.encrypt_complex(v, l, SCALE)
    steps = [1, 2, 5]
    outs = eng.hrotate_hoisted(ct, steps)
    for step, out in zip(steps, outs):
        got = eng.decrypt_complex(out)
        ref = eng.decrypt_complex(eng.hrotate(ct, step))
        assert np.max(np.abs(got - np.roll(v, -step))) < 1e-2, step
        assert np.max(np.abs(got - ref)) < 1e-2, step


class TestExtendedOps:
    def test_hsquare(self, small_engine):
        eng = small_engine
        l = eng.params.max_level
        ct, _ = _enc_pair(eng, 6, 0, l)
        out = eng.hsquare(ct)
        dec = eng.decrypt_bigint(out, count=1)
        assert abs(dec[0] / out.scale - 36) < 0.01

    def test_conjugate(self, small_engine):
        eng = small_engine
        p = eng.params
        slots = p.n // 2
        rng = np.random.default_rng(21)
        v = rng.normal(size=slots) + 1j * rng.normal(size=slots)
        ct = eng.encrypt_complex(v, p.max_level, SCALE)
        out = eng.decrypt_complex(eng.conjugate(ct))
        assert np.max(np.abs(out - np.conj(v))) < 1e-2

    def test_cmult_cadd(self, small_engine):
        eng = small_engine
        l = eng.params.max_level
        ct, _ = _enc_pair(eng, 5, 0, l)
        out = eng.cmult(ct, 2.5)
        dec = eng.decrypt_bigint(out, count=1)
        assert abs(dec[0] / out.scale - 12.5) < 0.001
        out2 = eng.cadd(ct, 1.25)
        dec2 = eng.decrypt_bigint(out2, count=1)
        assert abs(dec2[0] / out2.scale - 6.25) < 0.001

    def test_mod_drop_align(self, small_engine):
        eng = small_engine
        l = eng.params.max_level
        ct1, _ = _enc_pair(eng, 7, 0, l)
        ct2, _ = _enc_pair(eng, 11, 0, l - 2)
        a, b = eng.align_levels(ct1, ct2)
        assert a.level == b.level == l - 2
        dec = eng.decrypt_bigint(eng.hadd(a, b), count=1)
        assert abs(dec[0] / SCALE - 18) < 0.001


class TestCenteredConversion:
    """Regression tests for the centered base conversion.

    Non-centered ModUp digits (uniform [0, Q_d)) add a rank-one
    (all-ones x evk-noise) term whose canonical embedding is amplified
    ~2N/pi at the slot evaluating nearest zeta^1 — slot 0 picked up an
    input-independent O(0.1) error at N=2^16 (caught by the CLI
    decrypt-verify, round 2). Centering (the virtual-row [-Q_d] column)
    removes the mean, so the keyswitch noise spectrum must be flat.
    """

    def test_modup_lifts_centered_representative(self, small_params):
        from homulator_tpu.refimpl import RefCkks

        p = small_params
        ref = RefCkks(p, seed=3)
        ref.keygen()
        level = p.max_level
        rng = np.random.default_rng(3)
        c = np.stack([
            rng.integers(0, int(q), p.n, dtype=np.uint64)
            for q in p.q_arr[:level]
        ])
        import math
        for d in range(p.beta(level)):
            lo, hi = p.digit_range(level, d)
            Qd = math.prod(p.qs[lo:hi])
            nd = hi - lo
            out = ref.modup(c, level, d)  # [K_ext, N] (mains then specials)
            ext_idx = ref.ext_idx(level)
            other = [r for r, j in enumerate(ext_idx) if not (lo <= j < hi)]
            oqs = [int(p.qs[ext_idx[r]]) for r in other]
            # CRT over the other rows reconstructs the lifted integer
            # (|value| < (nd+1)*Qd/2 << prod of other primes).
            M = math.prod(oqs)
            crt = [(M // q) * pow((M // q) % q, -1, q) % M for q in oqs]
            for j in rng.integers(0, p.n, size=4):
                val = sum(int(out[r, j]) * crt[i]
                          for i, r in enumerate(other)) % M
                if val > M // 2:
                    val -= M
                # centered: |val| <= (nd+1)*Qd/2, and val == digit mod Qd
                assert abs(val) <= (nd + 1) * Qd // 2 + 1
                x = 0
                digit_qs = p.qs[lo:hi]
                Qd_crt = [
                    (Qd // q) * pow((Qd // q) % q, -1, q) % Qd
                    for q in digit_qs
                ]
                x = sum(int(c[lo + t, j]) * Qd_crt[t]
                        for t in range(nd)) % Qd
                assert val % Qd == x

    def test_keyswitch_noise_spectrum_flat(self):
        """The eval-domain noise spectrum of a key switch has no slot-0
        tone (ratio of the e=+-1 tone to the median eval energy stays
        O(1); it was ~300x before centering)."""
        from homulator_tpu.params import get_params
        from homulator_tpu.refimpl import RefCkks

        p = get_params(n=2048, max_level=6, alpha=2)
        ref = RefCkks(p, seed=1)
        ref.keygen()
        level = 3
        main = ref.main_idx(level)
        rng = np.random.default_rng(7)
        t = np.stack([
            rng.integers(0, int(q), p.n, dtype=np.uint64)
            for q in p.q_arr[main]
        ])
        key = ref._gen_kskey(ref.s_eval)  # switch s -> s
        e0, e1 = ref.keyswitch(t, key, level)
        want = ref.modmul(t, ref.s_eval[main], main)
        got = ref.modadd(
            e0, ref.modmul(e1, ref.s_eval[main], main), main)
        Q = p.q_prod(level)
        crt = [(Q // int(q)) * pow((Q // int(q)) % int(q), -1, int(q)) % Q
               for q in p.qs[:level]]
        diff = ref.modsub(got, want, main)
        dcoef = ref.intt(diff, main)
        d = np.array([
            float(x - Q) if (x := sum(int(dcoef[i, j]) * crt[i]
                                      for i in range(level)) % Q) > Q // 2
            else float(x)
            for j in range(p.n)
        ])
        a = np.zeros(2 * p.n, complex)
        a[:p.n] = d
        ev = np.fft.ifft(a) * 2 * p.n
        mag = np.abs(ev[1::2])
        tone = mag[0]
        med = np.median(mag)
        assert tone < 12 * med, (tone, med)
