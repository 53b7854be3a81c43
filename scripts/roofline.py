#!/usr/bin/env python
"""Roofline / MFU measurement for the attached TPU chip.

The north-star asks for >=90% of roofline *modmul* throughput per chip
(BASELINE.md:73-79). This script measures, all via chained on-device loops
(difference quotient, homulator_tpu/benchlib.py — the axon transport makes
per-dispatch timing unreliable):

  PEAKS (micro-kernels, compute-bound by construction):
    u32_mul    peak native uint32 elementwise multiply rate (VPU)
    shoup      peak Shoup modmul rate (the framework's constant-multiply
               primitive: ~10 hardware multiplies per modmul)
    mont       peak Montgomery modmul rate (REDC, ~11 multiplies)
    bf16_mxu   peak bf16 matmul rate (MXU, f32 accumulation)
    hbm        streaming bandwidth (y += x over HBM-resident arrays)

  ACHIEVED (framework kernels at the canonical set-B workload):
    ntt        Pallas 4-step NTT kernel, modmul/s and HBM GB/s
    bconv      fused bf16-plane base-conversion kernel, MXU FLOP/s
               (+ a matmul-only variant isolating the VPU epilogue share)
    hmult      whole hmult(45,35,15), modmul/s (analytic count / latency)

  DERIVED (static instruction counts, see NTT_OPS_* below):
    ntt issue-slot ceiling — the NTT butterfly is NOT a pure modmul
    stream: per element it issues adds/subtracts/compare-selects the
    "percent of Shoup peak" metric does not credit. The ceiling scales
    the measured Shoup-chain throughput by the instruction-count ratio.

Every measured metric is sampled --reps times (default 5); ROOFLINE.json
stores value (=min, the least-noise estimator for a chained-loop
quotient), med and max per metric.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# Static instruction counts for the derived NTT issue-slot ceiling.
# Counting rule: one VPU vector instruction per elementwise op (mul, add,
# sub, shift, mask, compare, select, copy); per-row constant preparation
# (twiddle hi/lo splits on [n,1] columns) excluded in BOTH counts, so the
# Shoup-chain normalizer and the kernel count are like for like.
#
# shoup_mul (the peak chain's primitive):
#   mulhi32 exact: a-split 2, muls 4 (ll,lh,hl,hh), mid add 1, carry cmp 1,
#   lo shl+add 2, carry cmp 1, hi shr+shl+3 adds 5            = 16
#   r = a*w - hi*q: 2 muls + 1 sub                            =  3
#   conditional subtract: cmp + sub + select                  =  3
OPS_SHOUP_FULL = 22
# Pallas NTT kernel, per element (ops/ntt_pallas.py):
#   per sliced CT stage, per butterfly PAIR:
#     u csub(3q) 3; shoup_mul_lazy3 = approx-mulhi 11 + mullo/mullo/sub 3;
#     u+v 1; u-v+3q 2                                          = 20 /pair
#   -> 10 per element x 16 stages                              = 160
#   mid twiddle shoup_mul_lazy3                                =  14
#   exit reduction csub x3                                     =   9
#   row-bit swap (fwd+inv) + transpose copies                  =   3
NTT_OPS_PER_ELEM = 186


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5,
                    help="samples per measured metric (min/med/max stored)")
    ap.add_argument("--only-hoisted", action="store_true",
                    help="re-run only the hoisted-amortization section, "
                         "merging into the existing ROOFLINE.json")
    ns_args = ap.parse_args()
    reps_n = ns_args.reps

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from homulator_tpu import benchlib
    from homulator_tpu.api import CkksEngine
    from homulator_tpu.ops.modmath import mont_mul, shoup_mul
    from homulator_tpu.params import get_params
    from homulator_tpu.stats import op_modmul_count

    results = {"backend": jax.default_backend()}
    root0 = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _hoisted_section(results, eng, params, ct1, sample_secs, put):
        """Hoisted-rotation amortization: k rotations sharing ONE ModUp
        (scan-form graph — constant program size in k). Everything large
        (keys, tables) is passed as jit ARGUMENTS: unbound defaults are
        captured constants and push the serialized program over the
        remote compile endpoint's request limit (HTTP 413, hit twice)."""
        import jax.numpy as jnp

        from homulator_tpu import benchlib
        from homulator_tpu.api import _hrotate_hoisted_scan_graph

        level = 35
        kt_h = eng.dc.keyswitch_tables(level)

        @jax.jit
        def _hoist_chain(a, ps, rs, kt_, iters):
            def body(_, y):
                outs = _hrotate_hoisted_scan_graph(y, ps, rs, kt_)
                return outs[0]
            return jax.lax.fori_loop(0, iters, body, a)

        for k in (1, 2, 4, 8):
            steps = list(range(1, k + 1))
            for s in steps:
                if s not in eng.rot_keys:
                    eng.gen_rotation_key(s)
            perm_stack = jnp.stack(
                [eng.dc.automorph_perm(params.galois_elt(s))
                 for s in steps])
            rotk_stack = jnp.stack([eng.rot_keys[s] for s in steps])
            lo, med, hi = sample_secs(
                lambda: benchlib.time_chained(
                    _hoist_chain, 4, 16, ct1.data, perm_stack, rotk_stack,
                    kt_h))
            put(f"hoisted_k{k}_per_rot_ms", lo / k * 1e3, med / k * 1e3,
                hi / k * 1e3)
            with open(os.path.join(root0, "ROOFLINE.json"), "w") as f:
                json.dump(results, f, indent=1)
        results["hoisted_amortization_k8_vs_k1"] = (
            results["hoisted_k1_per_rot_ms"]
            / results["hoisted_k8_per_rot_ms"])
        with open(os.path.join(root0, "ROOFLINE.json"), "w") as f:
            json.dump(results, f, indent=1)

    if ns_args.only_hoisted:
        with open(os.path.join(root0, "ROOFLINE.json")) as f:
            results = json.load(f)
        from homulator_tpu.api import CkksEngine as _Eng
        from homulator_tpu.params import get_params as _gp

        params = _gp(n=65536, max_level=45, alpha=15)
        eng = _Eng(params, seed=1)
        eng.keygen()
        scale = 2.0**29
        m = np.zeros(65536, dtype=np.int64)
        m[0] = int(3 * scale)
        ct1 = eng.encrypt_ints(m, 35, scale)

        def sample_secs(fn):
            vals = sorted(fn() for _ in range(reps_n))
            return vals[0], vals[len(vals) // 2], vals[-1]

        def put(name, best, med, worst):
            results[name] = best
            results[name + "_med"] = med
            results[name + "_worst"] = worst

        _hoisted_section(results, eng, params, ct1, sample_secs, put)
        print(json.dumps({k: v for k, v in results.items()
                          if "hoisted" in k}))
        return 0

    # ---- peak micro-kernels ----------------------------------------------
    S = 32  # multiplies chained per loop iteration (static unroll)
    ELEMS = 8 * 1024 * 1024  # 32 MB of uint32: larger than VMEM, fused loop
    rng = np.random.default_rng(0)
    q = np.uint32(716799361)  # largest-band prime scale (below 2^32/6)
    x0 = jnp.asarray(
        rng.integers(0, q, size=(2048, ELEMS // 2048), dtype=np.uint64
                     ).astype(np.uint32))
    w = np.uint32(123456789 % q)
    wsh = np.uint32((int(w) << 32) // int(q))
    qinv = np.uint32((-pow(int(q), -1, 1 << 32)) % (1 << 32))
    wm = np.uint32((int(w) << 32) % int(q))

    @jax.jit
    def _u32_mul_chain(x, iters):
        # dependent SQUARING chain: y*const would let XLA fold the S
        # multiplies into one (measured 2e18/s — impossible); y*y cannot
        # be algebraically collapsed.
        def body(_, y):
            for _ in range(S):
                y = y * y + jnp.uint32(12345)
            return y
        return jax.lax.fori_loop(0, iters, body, x)

    @jax.jit
    def _shoup_chain(x, iters):
        def body(_, y):
            for _ in range(S):
                y = shoup_mul(y, jnp.uint32(w), jnp.uint32(wsh), jnp.uint32(q))
            return y
        return jax.lax.fori_loop(0, iters, body, x)

    @jax.jit
    def _mont_chain(x, iters):
        def body(_, y):
            for _ in range(S):
                y = mont_mul(y, jnp.uint32(wm), jnp.uint32(q), jnp.uint32(qinv))
            return y
        return jax.lax.fori_loop(0, iters, body, x)

    def sample_secs(fn):
        """reps_n samples of a seconds-valued measurement: (min, med, max)."""
        vals = sorted(fn() for _ in range(reps_n))
        return vals[0], vals[len(vals) // 2], vals[-1]

    def put(name, best, med, worst):
        results[name] = best
        results[name + "_med"] = med
        results[name + "_worst"] = worst

    def rate(name, fn, *args, k1=8, k2=200):
        # one loop iteration is ~0.1-1 ms of device time; run hundreds so
        # the difference quotient clears the multi-ms transport noise.
        lo, med, hi = sample_secs(
            lambda: benchlib.time_chained(fn, k1, k2, *args))
        put(name, ELEMS * S / lo, ELEMS * S / med, ELEMS * S / hi)

    rate("peak_u32_mul_per_s", _u32_mul_chain, x0)
    rate("peak_shoup_modmul_per_s", _shoup_chain, x0)
    rate("peak_mont_modmul_per_s", _mont_chain, x0)

    # bf16 MXU peak: chained square matmul, bf16 accumulate-to-bf16 chain.
    DIM = 4096
    a0 = jnp.asarray(rng.normal(size=(DIM, DIM)).astype(np.float32)
                     ).astype(jnp.bfloat16) * jnp.bfloat16(1e-2)

    @jax.jit
    def _mxu_chain(z, a, iters):
        def body(_, y):
            y = jnp.dot(y, a, preferred_element_type=jnp.float32)
            return (y * 1e-4).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, z)

    lo, med, hi = sample_secs(
        lambda: benchlib.time_chained(_mxu_chain, 4, 64, a0, a0))
    put("peak_bf16_mxu_flop_per_s", 2 * DIM**3 / lo, 2 * DIM**3 / med,
        2 * DIM**3 / hi)

    # HBM streaming bandwidth: y = y + x over two HBM-resident arrays
    # (reads 2 arrays + writes 1 per iteration).
    BIG = 64 * 1024 * 1024  # 256 MB per array
    # random payload: an all-zeros array can be compressed/deduplicated
    # (measured above the HBM spec with zeros)
    xb = jnp.asarray(
        rng.integers(0, 1 << 32, size=(4096, BIG // 4096), dtype=np.uint64
                     ).astype(np.uint32))

    @jax.jit
    def _stream_chain(y, x, iters):
        # mul-xor body: z + x repeated is foldable to z + k*x (measured
        # 2.7 TB/s — above hardware); z*c ^ x is not.
        def body(_, z):
            return z * jnp.uint32(2654435761) ^ x
        return jax.lax.fori_loop(0, iters, body, y)

    lo, med, hi = sample_secs(
        lambda: benchlib.time_chained(_stream_chain, 4, 60, xb, xb))
    put("hbm_stream_gb_per_s", 3 * BIG * 4 / lo / 1e9,
        3 * BIG * 4 / med / 1e9, 3 * BIG * 4 / hi / 1e9)

    # ---- achieved: framework kernels at set B ----------------------------
    n, max_level, level, alpha = 65536, 45, 35, 15
    params = get_params(n=n, max_level=max_level, alpha=alpha)
    eng = CkksEngine(params, seed=1)
    eng.keygen()
    scale = 2.0**29
    m = np.zeros(n, dtype=np.int64)
    m[0] = int(3 * scale)
    ct1 = eng.encrypt_ints(m, level, scale)
    ct2 = eng.encrypt_ints(m, level, scale)

    # NTT kernel: modmuls per limb transform = (log2 n)*(n/2) butterflies
    # + n mid twiddles.
    logn = n.bit_length() - 1
    ntt_modmul = logn * (n // 2) + n
    lo, med, hi = sample_secs(
        lambda: benchlib.ntt_pair_seconds(eng, ct1.data[0], level))
    per_tf = lo / (2 * level)
    put("ntt_us_per_limb_transform", per_tf * 1e6, med / (2 * level) * 1e6,
        hi / (2 * level) * 1e6)
    results["ntt_achieved_modmul_per_s"] = ntt_modmul / per_tf
    results["ntt_pct_of_shoup_peak"] = (
        100 * results["ntt_achieved_modmul_per_s"]
        / results["peak_shoup_modmul_per_s"])
    # HBM floor: one read + one write of the [n] tile per transform.
    results["ntt_hbm_gb_per_s"] = 2 * n * 4 / per_tf / 1e9
    results["ntt_pct_of_hbm_peak"] = (
        100 * results["ntt_hbm_gb_per_s"] / results["hbm_stream_gb_per_s"])

    # Derived issue-slot ceiling (see NTT_OPS_PER_ELEM): the butterfly
    # network issues NTT_OPS_PER_ELEM vector instructions per element
    # against OPS_SHOUP_FULL per modmul in the peak chain, so the fastest
    # the kernel could run — if it sustained the same vector-issue rate
    # the Shoup chain does — is
    #     n * NTT_OPS_PER_ELEM / (OPS_SHOUP_FULL * peak_shoup)  seconds.
    # This credits the adds/subs/compare-selects the pct_of_shoup_peak
    # metric ignores. Caveat (stated in BENCH_NOTES): the chain is pure
    # back-to-back ALU with zero data movement; the kernel also pays
    # VMEM loads/stores between stages, so this ceiling is OPTIMISTIC.
    issue_rate = OPS_SHOUP_FULL * results["peak_shoup_modmul_per_s"]
    ceiling_s = n * NTT_OPS_PER_ELEM / issue_rate
    results["ntt_ops_per_elem"] = NTT_OPS_PER_ELEM
    results["ntt_issue_ceiling_us"] = ceiling_s * 1e6
    results["ntt_pct_of_issue_ceiling"] = 100 * ceiling_s / per_tf

    # Fused bconv kernel: set-B ModUp digit-0 shape (nd=15 -> 35 other rows).
    from homulator_tpu.ops.bconv_fused import bconv_fused

    kt = eng.dc.keyswitch_tables(level)
    dt = kt.digits[0]
    nd = dt.hi - dt.lo
    t = params.ntt
    xd = ct1.data[0][:nd].transpose(0, 2, 1)  # [nd, n1, n2] coeff-shaped

    @functools.partial(jax.jit, static_argnames=())
    def _bconv_chain(x, iters):
        def body(_, y):
            out = bconv_fused(y, dt.step1_pl, dt.step1_sh,
                              kt.main_nt.q[dt.lo:dt.hi], dt.mat_bf16,
                              dt.horner_sh, dt.other_nt.q, center=True)
            return out[:nd]  # feed a same-shaped slice back
        return jax.lax.fori_loop(0, iters, body, x)

    # the kernel is ~10 us: run enough chained iterations that device time
    # dominates the multi-ms transport noise.
    lo, med, hi = sample_secs(
        lambda: benchlib.time_chained(_bconv_chain, 8, 4000, xd))
    sec = lo
    m_out = dt.other_nt.q.shape[0]
    put("bconv_us_per_digit", lo * 1e6, med * 1e6, hi * 1e6)
    # bf16-plane matmul FLOPs actually issued to the MXU (the centered
    # conversion adds one input column for the virtual centering row):
    results["bconv_mxu_flop_per_s"] = 2 * (4 * m_out) * (4 * (nd + 1)) * n / sec
    results["bconv_pct_of_mxu_peak"] = (
        100 * results["bconv_mxu_flop_per_s"]
        / results["peak_bf16_mxu_flop_per_s"])
    results["bconv_modmul_equiv_per_s"] = m_out * nd * n / sec

    # Anatomy: the same shapes through a planes+matmul-ONLY kernel (no
    # step1, no pairing epilogue) — isolates what the VPU epilogue and
    # step1 cost on top of the MXU contraction, answering whether bigger
    # batched matmul shapes could raise bconv_pct_of_mxu_peak or the VPU
    # work is the true bound.
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mat = dt.mat_bf16
    PN = mat.shape[1]  # 4*(nd+1)

    def _mm_kernel(x_ref, mat_ref, o_ref):
        x = x_ref[:]  # [nd+1, bn, C] uint32 (pre-padded with a zero row)
        planes = [((x >> (8 * k)) & 255).astype(jnp.int32).astype(jnp.bfloat16)
                  for k in range(4)]
        xbig = jnp.concatenate(planes, axis=0)
        d_ = jax.lax.dot_general(
            mat_ref[:], xbig, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = d_.astype(jnp.int32).astype(jnp.uint32)[: o_ref.shape[0]]

    ndp = nd + 1

    @jax.jit
    def _mm_chain(xp, iters):
        R, C = xp.shape[1], xp.shape[2]
        bn = 8

        def body(_, y):
            out = pl.pallas_call(
                _mm_kernel,
                grid=(R // bn,),
                in_specs=[
                    pl.BlockSpec((ndp, bn, C), lambda j: (0, j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(mat.shape, lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((m_out, bn, C), lambda j: (0, j, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m_out, R, C), jnp.uint32),
            )(y, mat)
            return out[:ndp]

        return jax.lax.fori_loop(0, iters, body, xp)

    xdp = jnp.concatenate(
        [xd, jnp.zeros((1,) + tuple(xd.shape[1:]), jnp.uint32)], axis=0)
    lo, med, hi = sample_secs(
        lambda: benchlib.time_chained(_mm_chain, 8, 4000, xdp))
    put("bconv_matmul_only_us", lo * 1e6, med * 1e6, hi * 1e6)
    results["bconv_epilogue_share_pct"] = (
        100 * (results["bconv_us_per_digit"] - results["bconv_matmul_only_us"])
        / results["bconv_us_per_digit"])

    # Whole hmult.
    lo, med, hi = sample_secs(lambda: benchlib.hmult_seconds(eng, ct1, ct2))
    hm_sec = lo
    put("hmult_ms_sampled", lo * 1e3, med * 1e3, hi * 1e3)
    total_modmul = op_modmul_count("hmult", n, level, alpha,
                                   params.beta(level))
    results["hmult_ms"] = hm_sec * 1e3
    results["hmult_modmul_total"] = total_modmul
    results["hmult_achieved_modmul_per_s"] = total_modmul / hm_sec
    results["hmult_pct_of_shoup_peak"] = (
        100 * results["hmult_achieved_modmul_per_s"]
        / results["peak_shoup_modmul_per_s"])

    # Whole hrotate (the second headline keyswitch op, swept by every
    # reference script set) — same min/med/max discipline.
    lo, med, hi = sample_secs(
        lambda: benchlib.hrotate_seconds(eng, ct1, step=1))
    hr_sec = lo
    put("hrotate_ms_sampled", lo * 1e3, med * 1e3, hi * 1e3)
    hr_modmul = op_modmul_count("hrotate", n, level, alpha,
                                params.beta(level))
    results["hrotate_achieved_modmul_per_s"] = hr_modmul / hr_sec
    results["hrotate_pct_of_shoup_peak"] = (
        100 * results["hrotate_achieved_modmul_per_s"]
        / results["peak_shoup_modmul_per_s"])

    # Automorphism share of hrotate: chained sigma_g applications on the
    # full hrotate working set [2, level, n2, n1] (both components, as the
    # op applies it). Note the share overstates the op-level cost: the c0
    # gather overlaps into the key switch's slack (BENCH_NOTES hrotate
    # anatomy), so this is the standalone AUTOU cost, reference-style.
    from homulator_tpu.ops.automorph import automorph_eval

    perm1 = eng.dc.automorph_perm(params.galois_elt(1))

    @jax.jit
    def _auto_chain(x, p_, iters):
        def body(_, y):
            return automorph_eval(y, p_)
        return jax.lax.fori_loop(0, iters, body, x)

    both = jnp.stack([ct1.data[0], ct1.data[1]])
    lo, med, hi = sample_secs(
        lambda: benchlib.time_chained(_auto_chain, 8, 400, both, perm1))
    put("automorph_both_components_ms", lo * 1e3, med * 1e3, hi * 1e3)
    results["automorph_share_of_hrotate_pct"] = 100 * lo / hr_sec

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def flush():
        # progressive writes: a late-section failure (e.g. a compile-path
        # limit) must not lose the measurements already taken
        with open(os.path.join(root, "ROOFLINE.json"), "w") as f:
            json.dump(results, f, indent=1)

    flush()

    _hoisted_section(results, eng, params, ct1, sample_secs, put)

    for k, v in results.items():
        print(f"{k:40s} {v if isinstance(v, str) else f'{v:.6g}'}")
    flush()
    print(json.dumps({"roofline": "written"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
