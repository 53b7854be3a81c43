#!/usr/bin/env python
"""End-to-end encrypted logistic-regression inference on the TPU.

The second workload-level artifact (after bench_workload.py's matvec):
sigmoid(<x, w> + b) under encryption at the canonical set-B parameters,
compiled as ONE XLA program —

  score:   slotwise pmult, then a rotate-and-add reduction at the
           PRE-rescale scale (log2(slots) = 15 rotations, run as a
           lax.scan over stacked rotation keys so the program stays
           constant-size; reducing before the rescale keeps the
           accumulated keyswitch noise ~4 orders below the gate — see
           the noise budget in the body), + b, then ONE rescale
  sigmoid: the standard degree-3 CKKS polynomial
           0.5 + 0.197 t - 0.004 t^3, evaluated with the graph-level
           hsquare / hmult / const-mul pieces across three levels of
           descent (35 -> 34 -> 33 -> 32) with exact scale bookkeeping.

Decrypt-verified against the cleartext polynomial before timing; appends
one JSON line to outLogs/workloads/logreg.jsonl. Exercises the full op
surface (pmult, rescale, hrotate, hadd, padd, hsquare, hmult, cmult) in
one fused program — the serving shape of examples/encrypted_logreg.py at
production parameters.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from homulator_tpu import benchlib
    from homulator_tpu.api import (
        CkksEngine, _hrotate_graph, _hsquare_graph, hmult_graph,
    )
    from homulator_tpu.context import Ciphertext
    from homulator_tpu.ops.modmath import modadd, mont_mul, to_mont
    from homulator_tpu.ops.rescale import rescale_poly
    from homulator_tpu.params import get_params

    smoke = "--smoke" in sys.argv
    if smoke:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        n, max_level, alpha = 256, 10, 5
        # scale MUST track the prime size (2^29): the two sigmoid branches'
        # scales agree only when s^2/q ~ q — see the mismatch bound below
        level, scale = 8, 2.0**29
    else:
        n, max_level, alpha = 65536, 45, 15
        level, scale = 35, 2.0**29
    params = get_params(n=n, max_level=max_level, alpha=alpha)
    eng = CkksEngine(params, seed=11)
    eng.keygen()
    dc = eng.dc
    slots = n // 2
    logs = slots.bit_length() - 1

    rng = np.random.default_rng(11)
    x = rng.normal(size=slots)
    w = rng.normal(size=slots) / np.sqrt(slots)
    b = 0.3
    ct_x = eng.encrypt_complex(x, level, scale)
    pt_w = eng.plaintext_complex(w, level, scale)
    steps = [1 << i for i in range(logs)]
    for s in steps:
        eng.gen_rotation_key(s)

    # ---- per-level tables (the level descent 35 -> 34 -> 33 -> 32) ------
    def lvl(levl):
        return (dc.keyswitch_tables(levl), dc.ntt_basis((levl - 1,)),
                dc.ntt_basis(dc.main_rows(levl - 1)),
                dc.rescale_qinv_mont(levl))

    kt1, last1, out1, rs1 = lvl(level)          # pmult rescale 35 -> 34
    L2 = level - 1
    kt2, last2, out2, rs2 = lvl(L2)             # hsquare 34 -> 33
    L3 = level - 2
    kt3, last3, out3, rs3 = lvl(L3)             # hmult 33 -> 32
    L4 = level - 3

    perm_stack = jnp.stack(
        [dc.automorph_perm(params.galois_elt(s)) for s in steps])
    rotk_stack = jnp.stack([eng.rot_keys[s] for s in steps])

    def qq(levl):
        q, qinv, r2 = dc.q_level(levl)
        return (q[:, None, None], qinv[:, None, None], r2[:, None, None])

    # scale bookkeeping (mirrors api.py's float tracking)
    s_prod = scale * scale / params.qs[L2]      # after pmult + rescale
    s_t2 = s_prod * s_prod / params.qs[L3]      # after hsquare
    s_t3 = s_t2 * s_prod / params.qs[L4]        # after hmult
    delta = float(1 << params.scale_bits)
    s_cub = s_t3 * delta                        # after cmult(-0.004)
    # EXACT branch alignment: the lin branch (t at level L2) and the cub
    # branch (t^3, two rescales deeper) differ in scale by
    # s_t3*delta / (s_prod*delta) = (s_t2/q[L4]) — primes sit at ~2^29.4,
    # not 2^29, so this is ~3x, not ~1 (align_levels aligns LEVELS only;
    # the per-op example tolerates the residual because its cubic term is
    # tiny). Here the mismatch is absorbed EXACTLY into the linear
    # coefficient's encoding scale: delta_adj = s_cub / s_prod, so both
    # branches land on s_cub and the constant 0.5 is encoded there too.
    delta_adj = s_cub / s_prod
    s_out = s_cub

    def const_mont(value, levl, mult):
        c = int(round(value * mult))
        qs_ = params.q_arr[:levl].astype(np.int64)
        res = (np.int64(c) % qs_).astype(np.uint64)
        cm = ((res << np.uint64(32)) % qs_.astype(np.uint64)).astype(
            np.uint32)
        return jnp.asarray(cm)[:, None, None]

    c_lin = const_mont(0.197, L2, delta_adj)
    c_cub = const_mont(-0.004, L4, delta)
    # b joins BEFORE the rescale, at the product scale^2 (fits int64:
    # 0.3 * 2^58 < 2^63)
    pt_b = eng.plaintext_ints(
        np.concatenate([[int(round(b * scale * scale))],
                        np.zeros(n - 1, dtype=np.int64)]), level,
        scale * scale)
    half_pt = eng.plaintext_ints(
        np.concatenate([[int(round(0.5 * s_out))],
                        np.zeros(n - 1, dtype=np.int64)]), L4, s_out)

    q1, qi1, r21 = qq(level)
    q2, qi2, _ = qq(L2)
    q4, qi4, _ = qq(L4)

    # All tables + keys as jit ARGUMENTS (captured constants of this size
    # overwhelm the remote compile path — the matvec lesson).
    T = (kt1, last1, out1, rs1, kt2, last2, out2, rs2,
         kt3, last3, out3, rs3, eng.relin_key)

    def logreg(ct, ptw, ps, rs_keys, ptb, clin, ccub, pthalf, T):
        (kt1_, last1_, out1_, rs1_, kt2_, last2_, out2_, rs2_,
         kt3_, last3_, out3_, rs3_, evk) = T
        # score: pmult, then the rotate-and-add reduction BEFORE the
        # rescale. Noise budget (BENCH_NOTES r5): each rotation adds
        # ~7e2-unit keyswitch noise per coefficient; through the 15-deep
        # doubling tree that sums ~sqrt(2*slots)-fold. At the
        # post-rescale scale (2^28.7) the accumulated slot error is
        # ~1e-2 — the same magnitude as the verify gate (the r4 margin
        # of 8.6e-3 was a coin flip, VERDICT r4 weak #5). At the
        # pre-rescale scale (2^58) the same absolute noise is ~4e-10 per
        # slot, so the reduction is noise-free and ONE rescale after it
        # drops to the working scale.
        ptm = to_mont(ptw, r21, q1, qi1)
        prod = jnp.stack([mont_mul(ct[0], ptm, q1, qi1),
                          mont_mul(ct[1], ptm, q1, qi1)])

        # rotate-and-add reduction as a scan (constant program size)
        def body(a, xs):
            perm, rotk = xs
            rot = _hrotate_graph(a, perm, rotk, kt1_)
            return modadd(a, rot, q1[None]), 0.0

        acc, _ = jax.lax.scan(body, prod, (ps, rs_keys))
        acc = acc.at[0].set(modadd(acc[0], ptb, q1))  # + b (scale^2)
        acc = jnp.stack([rescale_poly(acc[k], last1_, out1_, rs1_)
                         for k in (0, 1)])
        t = acc
        # sigmoid: t2 = t^2 (34 -> 33); t3 = t * t2 (33 -> 32)
        t2 = _hsquare_graph(t, evk, kt2_, last2_, out2_, rs2_)
        t_dropped = t[:, : L3]
        t3 = hmult_graph(t_dropped, t2, evk, kt3_, last3_, out3_, rs3_)
        lin = jnp.stack([mont_mul(t[k], clin, q2, qi2) for k in (0, 1)])
        cub = jnp.stack([mont_mul(t3[k], ccub, q4, qi4) for k in (0, 1)])
        y = modadd(lin[:, : L4], cub, q4[None])
        return y.at[0].set(modadd(y[0], pthalf, q4))

    @jax.jit
    def chain(ct, ptw, ps, rs_keys, ptb, clin, ccub, pthalf, T, iters):
        def body(_, carry):
            out = logreg(carry, ptw, ps, rs_keys, ptb, clin, ccub,
                         pthalf, T)
            # re-extend to the input level so the loop chains (pad with
            # the dropped limbs of the carry; values are nonsense, which
            # chained timing doesn't care about)
            return jnp.concatenate([out, carry[:, L4:]], axis=1)
        return jax.lax.fori_loop(0, iters, body, ct)

    args = (ct_x.data, pt_w.data, perm_stack, rotk_stack, pt_b.data,
            c_lin, c_cub, half_pt.data, T)
    t0 = time.perf_counter()
    out = chain(*args, 1)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    y = eng.decrypt_complex(
        Ciphertext(out[:, : L4], L4, s_out))[0].real
    score = float(np.dot(x, w) + b)
    expected = 0.5 + 0.197 * score - 0.004 * score**3
    err = abs(y - expected)
    print(f"# score={score:.5f} got={y:.5f} poly={expected:.5f} "
          f"err={err:.2e}", flush=True)
    assert err < 1e-2, err
    if smoke:
        print("# smoke OK (verify passed; no artifact written)")
        return 0

    sec = benchlib.time_chained(chain, 2, 10, *args)
    rec = {
        "workload": "logreg_sigmoid3", "n": n, "max_level": max_level,
        "level": level, "alpha": alpha, "slots": slots,
        "e2e_ms": round(1e3 * sec, 3),
        "keyswitches": logs + 2,  # 15 rotations + hsquare + hmult
        "verify_err": err, "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    os.makedirs(os.path.join(ROOT, "outLogs", "workloads"), exist_ok=True)
    with open(os.path.join(ROOT, "outLogs", "workloads",
                           "logreg.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
