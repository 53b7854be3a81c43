"""Fused ModUp-NTT + evk inner product — the reference's HPIP unit, real.

The reference defines a dedicated high-performance inner-product unit (a
VecPECount x MacCount MAC grid streaming key digits against decomposed
data, include/Components.h:347-385, src/Components.cpp:571-668) that its
configs never enable. This kernel is that unit built for a TPU, and it
fuses MORE than the reference modeled: the per-digit ModUp NTT runs in the
same VMEM-resident pass, so the lifted eval-domain digits never exist in
HBM at all.

One grid step = (ext basis row r, digit d), digit innermost:

  term = NTT(conv_d[row r])          if r is outside digit d's own rows
         d_eval[r - alpha]           if r is digit d's own row (exact
                                     passthrough; see keyswitch.py)
  acc[k, r] (+)= term * evk[d, k, r]   for k in {0, 1}  (Montgomery, lazy)

with the accumulator block held in VMEM across the d-loop (classic
reduction grid: the output index map ignores d) and reduced to [0, q) on
the last digit. Compared to the unfused pipeline (NTT kernel over all
lifted rows -> XLA-fused inner product) this removes, at set B level 35:

  * the eval-domain digit write+read         (2 x 115 rows  ~ 60 MB)
  * per-digit-row mid-twiddle table DMA      (115 -> 50 row fetches ~ 33 MB)
  * the separate inner-product pass entirely (its VPU work now overlaps
    the NTT stream's DMA slack)

The evk streams through exactly once (both key components per step), which
is the HBM-rate evk streaming the reference's HPIP MAC grid models.

Bit-exact vs keyswitch.inner_product_pieces (tests/test_pallas_kernels.py).

Laziness bookkeeping (q < PRIME_CAP = 2^32/6):
  NTT branch exits un-reduced in [0, 6q); mont_mul_lazy(a, b) for a < 6q
  gives hi + mq_hi + carry <= 6q*q/2^32 + q + 1 <= 2q, so terms are <= 2q,
  the running accumulator is kept <= 2q by one conditional subtract per
  add (sums <= 4q < 2^32), and the final (csub 2q, csub q) lands in [0, q).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import mont_mul_lazy, shoup_mul_lazy3
from .ntt_pallas import _csub, _ct_stages_val


def _make_hpip_kernel(beta: int, alpha: int, spans, interpret: bool):
    """spans: static tuple of (lo, hi) main-limb digit ranges."""

    def kernel(q_ref, qinv_ref, p1_ref, p1s_ref, mid_ref, mids_ref, p2_ref,
               p2s_ref, *rest):
        conv_refs = rest[:beta]
        deval_ref, evk_ref, o_ref, term_ref = rest[beta:]
        r = pl.program_id(0)
        d = pl.program_id(1)
        q = q_ref[r, 0]
        qinv = qinv_ref[r, 0]

        # Is (r, d) an own-row step? (digit d's own rows pass through from
        # the eval-domain input; the conversion reproduces them exactly.)
        own = (d < 0)  # False, traced
        for dd, (lo, hi) in enumerate(spans):
            own = own | ((d == dd) & (r >= alpha + lo) & (r < alpha + hi))

        @pl.when(own)
        def _():
            term_ref[:] = deval_ref[0]  # [n2, n1] eval, [0, q)

        @pl.when(jnp.logical_not(own))
        def _():
            # Select this digit's converted row (the unused blocks are
            # already VMEM-resident; beta-1 full-tile selects are noise
            # next to the butterfly network).
            a = conv_refs[0][0]  # [n1, n2] coeff, [0, q)
            for dd in range(1, beta):
                a = jnp.where(d == dd, conv_refs[dd][0], a)
            # 4-step NTT, fully lazy: no exit reduction (term stays < 6q;
            # the Montgomery product below absorbs it).
            a = _ct_stages_val(a, p1_ref[0], p1s_ref[0], q, interpret)
            a = shoup_mul_lazy3(a, mid_ref[0], mids_ref[0], q)  # [0, 3q)
            a = a.T  # [n2, n1]
            term_ref[:] = _ct_stages_val(a, p2_ref[0], p2s_ref[0], q,
                                         interpret)  # [0, 6q)

        term = term_ref[:]
        t0 = mont_mul_lazy(term, evk_ref[0, 0, 0], q, qinv)  # <= 2q
        t1 = mont_mul_lazy(term, evk_ref[0, 1, 0], q, qinv)

        @pl.when(d == 0)
        def _():
            o_ref[0, 0] = t0
            o_ref[1, 0] = t1

        if beta > 1:
            @pl.when(d > 0)
            def _():
                o_ref[0, 0] = _csub(o_ref[0, 0] + t0, q + q)  # <= 4q -> <= 2q
                o_ref[1, 0] = _csub(o_ref[1, 0] + t1, q + q)

        @pl.when(d == beta - 1)
        def _():
            o_ref[0, 0] = _csub(_csub(o_ref[0, 0], q + q), q)  # [0, q)
            o_ref[1, 0] = _csub(_csub(o_ref[1, 0], q + q), q)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("alpha", "spans", "n1", "n2", "interpret")
)
def hpip_fused(convs, d_eval, evk_mont, q_ext, qinv_ext, pfwd, *, alpha,
               spans, n1, n2, interpret=False):
    """convs: per-digit COEFF-domain conversion outputs [m_other_d, n1, n2]
    (bconv_fused output, rows in ext order minus the digit's own rows).
    d_eval: [level, n2, n1] eval input poly. evk_mont: [dnum, 2, K_full,
    n2, n1] Montgomery key, specials-first rows. q_ext/qinv_ext: [K] ext
    primes (K = alpha + level <= K_full). pfwd: ext-basis NTT Shoup tables
    (NttBasis.pfwd). spans: static ((lo, hi), ...) digit ranges.

    Returns acc uint32[2, K, n2, n1] in [0, q): the two key-switch
    accumulators sum_d lift(digit_d) * evk[d, k] over the ext basis.
    """
    beta = len(convs)
    assert beta == len(spans) and beta >= 1
    K = q_ext.shape[0]
    p1, p1s, mid, mids, p2, p2s = pfwd
    l1 = n1.bit_length() - 1
    l2 = n2.bit_length() - 1

    def _row(_shape):
        return pl.BlockSpec((1,) + _shape, lambda r, d: (r,) + (0,) * len(_shape),
                            memory_space=pltpu.VMEM)

    conv_specs = []
    for (lo, hi) in spans:
        nd = hi - lo
        own_lo = alpha + lo  # first own row in ext order (>= 1: alpha >= 1)
        own_hi = alpha + hi

        def idx(r, d, own_lo=own_lo, own_hi=own_hi, nd=nd):
            # ext row -> conv-local row; own rows clamp to the previous
            # index so their (unused) block is never re-fetched.
            loc = jnp.where(
                r < own_lo, r,
                jnp.where(r >= own_hi, r - nd, own_lo - 1),
            )
            return (loc, 0, 0)

        conv_specs.append(
            pl.BlockSpec((1, n1, n2), idx, memory_space=pltpu.VMEM)
        )

    level = d_eval.shape[0]
    deval_spec = pl.BlockSpec(
        (1, n2, n1),
        lambda r, d: (jnp.clip(r - alpha, 0, level - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    evk_spec = pl.BlockSpec(
        (1, 2, 1, n2, n1), lambda r, d: (d, 0, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (2, 1, n2, n1), lambda r, d: (0, r, 0, 0), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        _make_hpip_kernel(beta, alpha, spans, interpret),
        grid=(K, beta),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row((n1, l1)), _row((n1, l1)),
            _row((n1, n2)), _row((n1, n2)),
            _row((n2, l2)), _row((n2, l2)),
            *conv_specs,
            deval_spec,
            evk_spec,
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, K, n2, n1), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((n2, n1), jnp.uint32)],
        interpret=interpret,
    )(
        q_ext.reshape(K, 1), qinv_ext.reshape(K, 1),
        p1, p1s, mid, mids, p2, p2s,
        *convs, d_eval, evk_mont,
    )
