"""Pallas kernels (interpreter mode) vs jnp graph path: bit-identical."""

import jax.numpy as jnp
import numpy as np
import pytest

from homulator_tpu.api import CkksEngine
from homulator_tpu.params import get_params

from .conftest import random_limbs

SCALE = 2.0**29


@pytest.fixture(scope="module")
def engines():
    params = get_params(n=256, max_level=6, alpha=2)
    ej = CkksEngine(params, seed=13, ntt_mode="jnp")
    ep = CkksEngine(params, seed=13, ntt_mode="interpret")
    ej.keygen()
    ep.keygen()
    return ej, ep


def test_ntt_kernel_matches(engines):
    ej, ep = engines
    p = ej.params
    rng = np.random.default_rng(0)
    x = random_limbs(p, np.arange(p.max_level), rng)
    xd = jnp.asarray(x.astype(np.uint32))
    yj = np.asarray(ej.ntt(xd, p.max_level))
    yp = np.asarray(ep.ntt(xd, p.max_level))
    assert np.array_equal(yj, yp)
    assert np.array_equal(
        np.asarray(ej.intt(jnp.asarray(yj), p.max_level)),
        np.asarray(ep.intt(jnp.asarray(yp), p.max_level)),
    )


def test_bconv_kernels_match(engines):
    """Fused MXU (bf16-plane) and Pallas-VPU bconv == Montgomery graph,
    bit-exact (fused kernel includes step1, so it's fed an identity
    scaling to isolate the conversion)."""
    from homulator_tpu.ops.bconv import bconv_step2
    from homulator_tpu.ops.bconv_fused import bconv_fused, build_bf16_tables
    from homulator_tpu.ops.bconv_pallas import bconv_step2_pallas

    ej, _ = engines
    p = ej.params
    rng = np.random.default_rng(1)
    nd, m_out = 2, 5
    xhat = jnp.asarray(random_limbs(p, np.arange(nd), rng).astype(np.uint32))
    # realistic matrix entries: residues mod the OUTPUT primes
    qs = p.q_arr[:m_out]
    mat_pl = rng.integers(0, 1 << 29, size=(m_out, nd)).astype(np.uint64) % qs[:, None]
    mat_mont = jnp.asarray(((mat_pl << np.uint64(32)) % qs[:, None]).astype(np.uint32))
    mat_sh = jnp.asarray(((mat_pl << np.uint64(32)) // qs[:, None]).astype(np.uint32))
    q = jnp.asarray(qs.astype(np.uint32))
    qinv = jnp.asarray(p.qinv_neg[:m_out].astype(np.uint32))
    ref = np.asarray(bconv_step2(xhat, mat_mont, q, qinv))
    out_vpu = np.asarray(
        bconv_step2_pallas(xhat, jnp.asarray(mat_pl.astype(np.uint32)),
                           mat_sh, q, interpret=True)
    )
    assert np.array_equal(ref, out_vpu)
    bf16, hsh = build_bf16_tables(mat_pl, qs)
    in_q = p.q_arr[:nd].astype(np.uint64)
    one_pl = jnp.asarray(np.ones(nd, dtype=np.uint32))
    one_sh = jnp.asarray(((np.ones(nd, dtype=np.uint64) << np.uint64(32))
                          // in_q).astype(np.uint32))
    t = p.ntt
    out_mxu = np.asarray(
        bconv_fused(xhat.reshape(nd, t.n1, t.n2), one_pl, one_sh,
                    jnp.asarray(in_q.astype(np.uint32)), bf16, hsh, q,
                    interpret=True)
    ).reshape(m_out, p.n)
    assert np.array_equal(ref, out_mxu)


def test_hpip_fused_matches_pieces(engines):
    """Fused ModUp-NTT + inner-product kernel (hpip_pallas) == the
    piecewise eval-domain path (modup_conv_all + inner_product_pieces),
    bit-exact, including the specials/main accumulator split."""
    from homulator_tpu.ops.keyswitch import (
        hpip_acc, inner_product_pieces, modup_conv_all, modup_convs_coeff,
    )

    _, ep = engines
    p = ep.params
    rng = np.random.default_rng(5)
    level = p.max_level  # 6: digits (0,2), (2,4), (4,6)
    kt = ep.dc.keyswitch_tables(level)
    t = p.ntt
    d_eval = jnp.asarray(
        random_limbs(p, np.arange(level), rng)
        .astype(np.uint32).reshape(level, t.n2, t.n1)
    )
    evk = ep.relin_key
    acc = np.asarray(hpip_acc(modup_convs_coeff(d_eval, kt), d_eval, evk, kt))
    pieces = inner_product_pieces(modup_conv_all(d_eval, kt), d_eval, evk, kt)
    alpha = p.alpha
    for k in (0, 1):
        sp, main = pieces[k]
        assert np.array_equal(acc[k, :alpha], np.asarray(sp)), k
        assert np.array_equal(acc[k, alpha:], np.asarray(main)), k


def test_hpip_fused_partial_digit(engines):
    """Same check at a level where the last digit is partial (level 5,
    alpha 2 -> digit spans (0,2) (2,4) (4,5))."""
    from homulator_tpu.ops.keyswitch import (
        hpip_acc, inner_product_pieces, modup_conv_all, modup_convs_coeff,
    )

    _, ep = engines
    p = ep.params
    rng = np.random.default_rng(6)
    level = 5
    kt = ep.dc.keyswitch_tables(level)
    t = p.ntt
    d_eval = jnp.asarray(
        random_limbs(p, np.arange(level), rng)
        .astype(np.uint32).reshape(level, t.n2, t.n1)
    )
    evk = ep.relin_key
    acc = np.asarray(hpip_acc(modup_convs_coeff(d_eval, kt), d_eval, evk, kt))
    pieces = inner_product_pieces(modup_conv_all(d_eval, kt), d_eval, evk, kt)
    alpha = p.alpha
    for k in (0, 1):
        sp, main = pieces[k]
        assert np.array_equal(acc[k, :alpha], np.asarray(sp)), k
        assert np.array_equal(acc[k, alpha:], np.asarray(main)), k


def test_full_hmult_matches(engines):
    """Whole hmult through Pallas kernels == jnp graph, bit-exact."""
    ej, ep = engines
    p = ej.params
    m = np.zeros(p.n, dtype=np.int64)
    m[0] = int(7 * SCALE)
    l = p.max_level
    c1j = ej.encrypt_ints(m, l, SCALE)
    c2j = ej.encrypt_ints(m, l, SCALE)
    c1p = ep.encrypt_ints(m, l, SCALE)
    c2p = ep.encrypt_ints(m, l, SCALE)
    assert np.array_equal(np.asarray(c1j.data), np.asarray(c1p.data))
    oj = ej.hmult(c1j, c2j)
    op_ = ep.hmult(c1p, c2p)
    assert np.array_equal(np.asarray(oj.data), np.asarray(op_.data))


def test_full_hrotate_matches(engines):
    ej, ep = engines
    p = ej.params
    m = np.zeros(p.n, dtype=np.int64)
    m[0] = int(3 * SCALE)
    l = p.max_level
    c1j = ej.encrypt_ints(m, l, SCALE)
    c1p = ep.encrypt_ints(m, l, SCALE)
    oj = ej.hrotate(c1j, 1)
    op_ = ep.hrotate(c1p, 1)
    assert np.array_equal(np.asarray(oj.data), np.asarray(op_.data))


def test_bconv_fused_max_digit_stress():
    """Range stress at the LARGEST digit this framework builds (nd = 29 =
    set A's alpha+1 tail) with primes at both ends of the allowed band —
    guards the pairing epilogue's wrap-freedom bounds (a too-weak bound
    once corrupted results by 2^32 mod q, on-chip only)."""
    import jax.numpy as jnp

    from homulator_tpu import numtheory as nt
    from homulator_tpu.ops.bconv_fused import bconv_fused, build_bf16_tables

    rng = np.random.default_rng(123)
    n1 = n2 = 16
    nd, m_out = 29, 8
    in_q = np.array(nt.gen_ntt_primes(64, nd), dtype=np.uint64)
    # output primes from the small end of the band (worst lo/q ratio)
    out_q = np.array(
        nt.gen_ntt_primes(64, m_out, start_bits=29), dtype=np.uint64)
    mat = rng.integers(0, out_q.min(), size=(m_out, nd)).astype(np.uint64)
    s = rng.integers(1, in_q, size=nd).astype(np.uint64)
    x = np.stack(
        [rng.integers(0, q, size=(n1, n2), dtype=np.uint64) for q in in_q])
    bf16, hsh = build_bf16_tables(mat, out_q)
    s_pl = jnp.asarray(s.astype(np.uint32))
    s_sh = jnp.asarray(((s << np.uint64(32)) // in_q).astype(np.uint32))
    out = np.asarray(
        bconv_fused(
            jnp.asarray(x.astype(np.uint32)), s_pl, s_sh,
            jnp.asarray(in_q.astype(np.uint32)), bf16, hsh,
            jnp.asarray(out_q.astype(np.uint32)), interpret=True,
        )
    ).astype(np.uint64)
    xh = (x * s[:, None, None]) % in_q[:, None, None]
    for j in range(m_out):
        acc = np.zeros((n1, n2), dtype=object)
        for i in range(nd):
            acc += int(mat[j, i]) * xh[i].astype(object)
        assert np.array_equal(out[j], (acc % int(out_q[j])).astype(np.uint64)), j


def test_lane_packed_phase_kernels_match():
    """Lane-packed phase kernels (k limbs side-by-side in the lane axis,
    the narrow-shard lever from WIDTH_SCALING.json) == the per-limb phase
    kernels, element-exact, for all four phases."""
    import jax.numpy as jnp

    from homulator_tpu.ops.ntt_pallas import (
        intt_phase1_packed_pallas, intt_phase1_pallas,
        intt_phase2_packed_pallas, intt_phase2_pallas,
        ntt_phase1_packed_pallas, ntt_phase1_pallas,
        ntt_phase2_packed_pallas, ntt_phase2_pallas,
        pack_limb_lanes, pack_phase_tables, unpack_limb_lanes,
    )

    params = get_params(n=4096, max_level=4, alpha=2)  # n1 = n2 = 64
    eng = CkksEngine(params, seed=3, ntt_mode="interpret")
    dc = eng.dc
    nb = dc.ntt_basis(dc.main_rows(4))
    n1, n2 = nb.n1, nb.n2
    M, k, c = 4, 2, n2 // 2
    p1, p1s, mid, mids, p2, p2s = nb.pfwd
    ip1, ip1s, midi, midis, ip2, ip2s = nb.pinv
    rng = np.random.default_rng(5)
    for col0 in (0, c):  # both device column slices
        x = jnp.asarray(rng.integers(
            0, np.asarray(params.q_arr[:M])[:, None, None],
            size=(M, n1, c), dtype=np.uint64).astype(np.uint32))
        # forward phase 1
        ref = ntt_phase1_pallas(
            x, nb.q, p1, p1s, mid[:, :, col0:col0 + c],
            mids[:, :, col0:col0 + c], n1=n1, c=c, interpret=True)
        qrow, p1p, p1sp, midp, midsp = pack_phase_tables(
            np.asarray(nb.q), np.asarray(p1), np.asarray(p1s),
            np.asarray(mid), np.asarray(mids), k, c, col0=col0)
        got = unpack_limb_lanes(ntt_phase1_packed_pallas(
            pack_limb_lanes(x, k), qrow, p1p, p1sp, midp, midsp,
            n1=n1, interpret=True), k, c)
        assert np.array_equal(np.asarray(got), np.asarray(ref)), "p1 fwd"
        # forward phase 2 (mid tables unused: pass zeros-shaped slices)
        y = jnp.asarray(rng.integers(
            0, np.asarray(params.q_arr[:M])[:, None, None],
            size=(M, n2, c), dtype=np.uint64).astype(np.uint32))
        ref2 = ntt_phase2_pallas(y, nb.q, p2, p2s, n2=n2, c=c,
                                 interpret=True)
        qrow2, p2p, p2sp, _, _ = pack_phase_tables(
            np.asarray(nb.q), np.asarray(p2), np.asarray(p2s),
            np.asarray(mid), np.asarray(mids), k, c, col0=col0)
        got2 = unpack_limb_lanes(ntt_phase2_packed_pallas(
            pack_limb_lanes(y, k), qrow2, p2p, p2sp, n2=n2,
            interpret=True), k, c)
        assert np.array_equal(np.asarray(got2), np.asarray(ref2)), "p2 fwd"
        # inverse phase 2
        ref3 = intt_phase2_pallas(y, nb.q, ip2, ip2s, n2=n2, c=c,
                                  interpret=True)
        _, ip2p, ip2sp, _, _ = pack_phase_tables(
            np.asarray(nb.q), np.asarray(ip2), np.asarray(ip2s),
            np.asarray(midi), np.asarray(midis), k, c, col0=col0)
        got3 = unpack_limb_lanes(intt_phase2_packed_pallas(
            pack_limb_lanes(y, k), qrow, ip2p, ip2sp, n2=n2,
            interpret=True), k, c)
        assert np.array_equal(np.asarray(got3), np.asarray(ref3)), "p2 inv"
        # inverse phase 1
        ref4 = intt_phase1_pallas(
            x, nb.q, midi[:, :, col0:col0 + c], midis[:, :, col0:col0 + c],
            ip1, ip1s, n1=n1, c=c, interpret=True)
        _, ip1p, ip1sp, midip, midisp = pack_phase_tables(
            np.asarray(nb.q), np.asarray(ip1), np.asarray(ip1s),
            np.asarray(midi), np.asarray(midis), k, c, col0=col0)
        got4 = unpack_limb_lanes(intt_phase1_packed_pallas(
            pack_limb_lanes(x, k), qrow, midip, midisp, ip1p, ip1sp,
            n1=n1, interpret=True), k, c)
        assert np.array_equal(np.asarray(got4), np.asarray(ref4)), "p1 inv"
