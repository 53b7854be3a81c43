"""Diagnose the HPIP fused kernel: which ingredient costs what.

Variants (same grid/BlockSpecs as ops/hpip_pallas.py):
  full       NTT-in-kernel + dual evk multiply + accumulate   (the real one)
  no_ip      NTT only, out = term (no evk input, no accumulate)
  no_ntt     evk multiply + accumulate on the RAW conv block (no NTT)
  ntt115     plain ntt_pallas over the 115 stacked conv rows (baseline)
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from homulator_tpu.api import CkksEngine
from homulator_tpu.benchlib import time_chained
from homulator_tpu.ops.modmath import mont_mul_lazy, shoup_mul_lazy3
from homulator_tpu.ops.ntt_pallas import _csub, _ct_stages_val
from homulator_tpu.ops.keyswitch import modup_convs_coeff
from homulator_tpu.params import get_params


def make_kernel(beta, alpha, spans, mode):
    def kernel(q_ref, qinv_ref, p1_ref, p1s_ref, mid_ref, mids_ref, p2_ref,
               p2s_ref, *rest):
        conv_refs = rest[:beta]
        if mode == "no_ip":
            deval_ref, o_ref, term_ref = rest[beta:]
        else:
            deval_ref, evk_ref, o_ref, term_ref = rest[beta:]
        r = pl.program_id(0)
        d = pl.program_id(1)
        q = q_ref[r, 0]
        qinv = qinv_ref[r, 0]
        own = (d < 0)
        for dd, (lo, hi) in enumerate(spans):
            own = own | ((d == dd) & (r >= alpha + lo) & (r < alpha + hi))

        @pl.when(own)
        def _():
            term_ref[:] = deval_ref[0]

        @pl.when(jnp.logical_not(own))
        def _():
            a = conv_refs[0][0]
            for dd in range(1, beta):
                a = jnp.where(d == dd, conv_refs[dd][0], a)
            if mode == "no_ntt":
                term_ref[:] = a.T
            else:
                a = _ct_stages_val(a, p1_ref[0], p1s_ref[0], q, False)
                a = shoup_mul_lazy3(a, mid_ref[0], mids_ref[0], q)
                a = a.T
                term_ref[:] = _ct_stages_val(a, p2_ref[0], p2s_ref[0], q, False)

        term = term_ref[:]
        if mode == "no_ip":
            @pl.when(d == beta - 1)
            def _():
                o_ref[0, 0] = term
                o_ref[1, 0] = term
            return
        t0 = mont_mul_lazy(term, evk_ref[0, 0, 0], q, qinv)
        t1 = mont_mul_lazy(term, evk_ref[0, 1, 0], q, qinv)

        @pl.when(d == 0)
        def _():
            o_ref[0, 0] = t0
            o_ref[1, 0] = t1

        if beta > 1:
            @pl.when(d > 0)
            def _():
                o_ref[0, 0] = _csub(o_ref[0, 0] + t0, q + q)
                o_ref[1, 0] = _csub(o_ref[1, 0] + t1, q + q)

        @pl.when(d == beta - 1)
        def _():
            o_ref[0, 0] = _csub(_csub(o_ref[0, 0], q + q), q)
            o_ref[1, 0] = _csub(_csub(o_ref[1, 0], q + q), q)

    return kernel


@functools.partial(jax.jit, static_argnames=("alpha", "spans", "n1", "n2", "mode"))
def hpip_variant(convs, d_eval, evk, q_ext, qinv_ext, pfwd, *, alpha, spans,
                 n1, n2, mode):
    beta = len(convs)
    K = q_ext.shape[0]
    p1, p1s, mid, mids, p2, p2s = pfwd
    l1 = n1.bit_length() - 1
    l2 = n2.bit_length() - 1

    def _row(shape):
        return pl.BlockSpec((1,) + shape, lambda r, d: (r,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    conv_specs = []
    for (lo, hi) in spans:
        nd = hi - lo
        own_lo, own_hi = alpha + lo, alpha + hi

        def idx(r, d, own_lo=own_lo, own_hi=own_hi, nd=nd):
            loc = jnp.where(r < own_lo, r,
                            jnp.where(r >= own_hi, r - nd, own_lo - 1))
            return (loc, 0, 0)

        conv_specs.append(pl.BlockSpec((1, n1, n2), idx, memory_space=pltpu.VMEM))

    level = d_eval.shape[0]
    deval_spec = pl.BlockSpec(
        (1, n2, n1), lambda r, d: (jnp.clip(r - alpha, 0, level - 1), 0, 0),
        memory_space=pltpu.VMEM)
    evk_spec = pl.BlockSpec((1, 2, 1, n2, n1), lambda r, d: (d, 0, r, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2, 1, n2, n1), lambda r, d: (0, r, 0, 0),
                            memory_space=pltpu.VMEM)
    ins = [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pltpu.SMEM),
           _row((n1, l1)), _row((n1, l1)), _row((n1, n2)), _row((n1, n2)),
           _row((n2, l2)), _row((n2, l2)), *conv_specs, deval_spec]
    args = [q_ext.reshape(K, 1), qinv_ext.reshape(K, 1),
            p1, p1s, mid, mids, p2, p2s, *convs, d_eval]
    if mode != "no_ip":
        ins.append(evk_spec)
        args.append(evk)
    return pl.pallas_call(
        make_kernel(beta, alpha, spans, mode),
        grid=(K, beta),
        in_specs=ins,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, K, n2, n1), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((n2, n1), jnp.uint32)],
    )(*args)


def main():
    params = get_params(n=1 << 16, max_level=45, alpha=15)
    eng = CkksEngine(params, seed=1)
    eng.keygen()
    level = 35
    kt = eng.dc.keyswitch_tables(level)
    evk = eng.relin_key
    nt = kt.ext_nt
    alpha = params.alpha
    spans = tuple((dt.lo, dt.hi) for dt in kt.digits)

    rng = np.random.default_rng(0)
    m = np.zeros(params.n, dtype=np.int64)
    m[: params.n // 2] = rng.integers(-100, 100, size=params.n // 2)
    ct = eng.encrypt_ints(m, level, 2.0**29)
    x = ct.data[0]
    convs = jax.block_until_ready(modup_convs_coeff(x, kt))

    def chain(mode):
        @jax.jit
        def f(x, iters):
            def body(_, carry):
                acc = hpip_variant(convs, carry, evk, nt.q, nt.qinv, nt.pfwd,
                                   alpha=alpha, spans=spans, n1=nt.n1,
                                   n2=nt.n2, mode=mode)
                return acc[0, alpha:]
            return jax.lax.fori_loop(0, iters, body, x)
        return f

    from homulator_tpu.ops.ntt import ntt

    @jax.jit
    def f_ntt115(c0, c1, c2, x, iters):
        nts = [dt.other_nt for dt in kt.digits]

        def body(_, carry):
            t = carry[:1].transpose(0, 2, 1)  # [1, n1, n2] dep token
            y0 = ntt(c0 ^ t, nts[0])
            y1 = ntt(c1 ^ t, nts[1])
            y2 = ntt(c2 ^ t, nts[2])
            return y0[:level] ^ y1[:level] ^ y2[:level]

        return jax.lax.fori_loop(0, iters, body, x)

    for mode in ("full", "no_ip", "no_ntt"):
        f = chain(mode)
        ts = sorted(time_chained(f, 4, 60, x) for _ in range(3))
        print(f"hpip[{mode:6s}]  {ts[0] * 1e3:8.3f} ms  (median {ts[1] * 1e3:.3f})")
    ts = sorted(time_chained(f_ntt115, 4, 60, *convs, x) for _ in range(3))
    print(f"plain ntt x115    {ts[0] * 1e3:8.3f} ms  (median {ts[1] * 1e3:.3f})")


if __name__ == "__main__":
    main()
