"""HPIP diagnosis round 2: block-layout and accumulation variants.

Round 1 (bench_hpip_diag.py) established:
  no_ip  (NTT in conditional grid, no evk)   0.379 ms  == plain ntt x115
  no_ntt (evk mult + accumulate, no NTT)     0.479 ms  (ALU+DMA est ~0.22)
  full                                       0.778 ms  (additive)

So the evk-product/accumulate half runs ~2x its resource estimate.
Variants here (all no_ntt-style, conv passthrough):
  base      round-1 no_ntt: evk block [1,2,1,R,C], out block [2,1,R,C]
  split     evk as TWO 4-D inputs [dnum,K,R,C] (block [1,1,R,C]),
            out as TWO 3-D outputs [K,R,C] (block [1,R,C])
  noacc     split + no read-modify-write (out written once at last digit)
  fullsplit the REAL kernel (NTT + IP) with split evk/out blocks
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
    with_ntt = mode == "fullsplit"

    def kernel(q_ref, qinv_ref, p1_ref, p1s_ref, mid_ref, mids_ref, p2_ref,
               p2s_ref, *rest):
        conv_refs = rest[:beta]
        deval_ref, evk0_ref, evk1_ref, o0_ref, o1_ref, term_ref = rest[beta:]
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
            if with_ntt:
                a = _ct_stages_val(a, p1_ref[0], p1s_ref[0], q, False)
                a = shoup_mul_lazy3(a, mid_ref[0], mids_ref[0], q)
                term_ref[:] = _ct_stages_val(a.T, p2_ref[0], p2s_ref[0], q,
                                             False)
            else:
                term_ref[:] = a.T

        term = term_ref[:]
        t0 = mont_mul_lazy(term, evk0_ref[0, 0], q, qinv)
        t1 = mont_mul_lazy(term, evk1_ref[0, 0], q, qinv)

        if mode == "noacc":
            @pl.when(d == beta - 1)
            def _():
                o0_ref[0] = _csub(t0, q)
                o1_ref[0] = _csub(t1, q)
            return

        @pl.when(d == 0)
        def _():
            o0_ref[0] = t0
            o1_ref[0] = t1

        if beta > 1:
            @pl.when(d > 0)
            def _():
                o0_ref[0] = _csub(o0_ref[0] + t0, q + q)
                o1_ref[0] = _csub(o1_ref[0] + t1, q + q)

        @pl.when(d == beta - 1)
        def _():
            o0_ref[0] = _csub(_csub(o0_ref[0], q + q), q)
            o1_ref[0] = _csub(_csub(o1_ref[0], q + q), q)

    return kernel


@functools.partial(jax.jit, static_argnames=("alpha", "spans", "n1", "n2", "mode"))
def hpip_v2(convs, d_eval, evk0, evk1, q_ext, qinv_ext, pfwd, *, alpha, spans,
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
    evk_spec = pl.BlockSpec((1, 1, n2, n1), lambda r, d: (d, r, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n2, n1), lambda r, d: (r, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(beta, alpha, spans, mode),
        grid=(K, beta),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  _row((n1, l1)), _row((n1, l1)), _row((n1, n2)), _row((n1, n2)),
                  _row((n2, l2)), _row((n2, l2)), *conv_specs, deval_spec,
                  evk_spec, evk_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((K, n2, n1), jnp.uint32)] * 2,
        scratch_shapes=[pltpu.VMEM((n2, n1), jnp.uint32)],
    )(q_ext.reshape(K, 1), qinv_ext.reshape(K, 1),
      p1, p1s, mid, mids, p2, p2s, *convs, d_eval, evk0, evk1)


def main():
    params = get_params(n=1 << 16, max_level=45, alpha=15)
    eng = CkksEngine(params, seed=1)
    eng.keygen()
    level = 35
    kt = eng.dc.keyswitch_tables(level)
    nt = kt.ext_nt
    alpha = params.alpha
    spans = tuple((dt.lo, dt.hi) for dt in kt.digits)
    K = alpha + level
    evk0 = jax.block_until_ready(jnp.copy(eng.relin_key[:, 0, :K]))
    evk1 = jax.block_until_ready(jnp.copy(eng.relin_key[:, 1, :K]))

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
                a0, a1 = hpip_v2(convs, carry, evk0, evk1, nt.q, nt.qinv,
                                 nt.pfwd, alpha=alpha, spans=spans,
                                 n1=nt.n1, n2=nt.n2, mode=mode)
                return a0[alpha:] ^ a1[:1]
            return jax.lax.fori_loop(0, iters, body, x)
        return f

    for mode in ("split", "noacc", "fullsplit"):
        f = chain(mode)
        ts = sorted(time_chained(f, 4, 60, x) for _ in range(3))
        print(f"hpip2[{mode:9s}]  {ts[0] * 1e3:8.3f} ms  (median {ts[1] * 1e3:.3f})")


if __name__ == "__main__":
    main()
