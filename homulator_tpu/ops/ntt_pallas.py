"""Pallas TPU kernel for the 4-step negacyclic NTT / iNTT.

One kernel instance transforms one RNS limb: the [n1, n2] coefficient tile
is loaded into VMEM once, all butterfly stages + the mid twiddle + the
transpose happen on-chip, and the result is written back — the VMEM
working-set discipline the reference models as its per-cluster scratchpad
(mem.h:214-463) and 4-phase NTTU pipeline (Components.cpp:380-569). The
grid runs over limbs (the reference's limb-per-cluster parallelism,
Driver.h:158), with Pallas double-buffering consecutive limbs' DMA against
compute.

Butterfly formulation chosen for Mosaic: everything stays a 2-D [n, m]
vector op. A stage's partner rows come from two sublane rolls (+H / -H)
selected by a (row & H) mask, and its per-block twiddles are pre-expanded
host-side into full [n] columns (NttBasis.*_exp, one column per stage) —
no 1-D reshapes, no gathers, no data-dependent layout changes inside the
kernel. All tables are Montgomery-form uint32.

The jnp graph version (ops/ntt.py) remains the portable reference path;
this kernel is bit-identical to it (asserted in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import modadd, modsub, mont_mul


def _roll_rows(a: jnp.ndarray, shift: int, interpret: bool) -> jnp.ndarray:
    """Circular roll along axis 0; jnp.roll in interpret mode (pltpu.roll
    requires the Mosaic lowering)."""
    if interpret:
        return jnp.roll(a, shift, axis=0)
    return pltpu.roll(a, shift, axis=0)


def _partner(a: jnp.ndarray, H: int, first, interpret: bool) -> jnp.ndarray:
    """partner[r] = a[r ^ H]: a[r+H] on first-half rows, a[r-H] on second."""
    n = a.shape[0]
    down = _roll_rows(a, (-H) % n, interpret)  # a[r+H]
    up = _roll_rows(a, H, interpret)  # a[r-H]
    return jnp.where(first, down, up)


def _ct_stages_val(a, twe_cols, q, qinv, interpret):
    """CT butterflies: a [n, m]; twe_cols [n, log2(n)] expanded twiddles."""
    n = a.shape[0]
    logn = n.bit_length() - 1
    row = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
    for s in range(logn):
        H = n >> (s + 1)
        first = (row & H) == 0
        p = _partner(a, H, first, interpret)
        # v = partner on first rows, self on second; u is the other one.
        t = mont_mul(jnp.where(first, p, a), twe_cols[:, s: s + 1], q, qinv)
        a = jnp.where(first, modadd(a, t, q), modsub(p, t, q))
    return a


def _gs_stages_val(a, twe_cols, q, qinv, interpret):
    """GS inverse butterflies (no 1/n factor; folded into tw_mid_inv)."""
    n = a.shape[0]
    logn = n.bit_length() - 1
    row = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
    for s in range(logn - 1, -1, -1):
        H = n >> (s + 1)
        first = (row & H) == 0
        p = _partner(a, H, first, interpret)
        # first rows: u + v; second rows: (u - v) * w with u = partner, v = a.
        diff = modsub(p, a, q)
        a = jnp.where(
            first,
            modadd(a, p, q),
            mont_mul(diff, twe_cols[:, s: s + 1], q, qinv),
        )
    return a


def _make_ntt_kernel(interpret: bool):
    def kernel(q_ref, qi_ref, psi1_ref, twmid_ref, psi2_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        qi = qi_ref[i, 0]
        a = x_ref[0]  # [n1, n2]
        a = _ct_stages_val(a, psi1_ref[0], q, qi, interpret)
        a = mont_mul(a, twmid_ref[0], q, qi)
        a = a.T  # [n2, n1]
        a = _ct_stages_val(a, psi2_ref[0], q, qi, interpret)
        o_ref[0] = a

    return kernel


def _make_intt_kernel(interpret: bool):
    def kernel(q_ref, qi_ref, ipsi1_ref, twmidinv_ref, ipsi2_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        qi = qi_ref[i, 0]
        a = x_ref[0]  # [n2, n1]
        a = _gs_stages_val(a, ipsi2_ref[0], q, qi, interpret)
        a = a.T  # [n1, n2]
        a = mont_mul(a, twmidinv_ref[0], q, qi)
        a = _gs_stages_val(a, ipsi1_ref[0], q, qi, interpret)
        o_ref[0] = a

    return kernel


def _slab(*shape):
    """Per-limb slab: block [1, ...] along the leading (limb) grid axis."""
    nd = len(shape)
    return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


_SMEM_FULL = pl.BlockSpec(memory_space=pltpu.SMEM)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "interpret"))
def ntt_pallas(x, q, qinv, psi1_exp, tw_mid, psi2_exp, *, n1, n2, interpret=False):
    """x: [M, N]; q/qinv: [M]; psi1_exp: [M, n1, log n1];
    tw_mid: [M, n1, n2]; psi2_exp: [M, n2, log n2]. Returns [M, N]."""
    M, N = x.shape
    l1 = n1.bit_length() - 1
    l2 = n2.bit_length() - 1
    out = pl.pallas_call(
        _make_ntt_kernel(interpret),
        grid=(M,),
        in_specs=[
            _SMEM_FULL, _SMEM_FULL,
            _slab(n1, l1), _slab(n1, n2), _slab(n2, l2), _slab(n1, n2),
        ],
        out_specs=_slab(n2, n1),
        out_shape=jax.ShapeDtypeStruct((M, n2, n1), jnp.uint32),
        interpret=interpret,
    )(
        q.reshape(M, 1), qinv.reshape(M, 1),
        psi1_exp, tw_mid, psi2_exp, x.reshape(M, n1, n2),
    )
    return out.reshape(M, N)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "interpret"))
def intt_pallas(x, q, qinv, ipsi1_exp, tw_mid_inv, ipsi2_exp, *, n1, n2,
                interpret=False):
    M, N = x.shape
    l1 = n1.bit_length() - 1
    l2 = n2.bit_length() - 1
    out = pl.pallas_call(
        _make_intt_kernel(interpret),
        grid=(M,),
        in_specs=[
            _SMEM_FULL, _SMEM_FULL,
            _slab(n1, l1), _slab(n1, n2), _slab(n2, l2), _slab(n2, n1),
        ],
        out_specs=_slab(n1, n2),
        out_shape=jax.ShapeDtypeStruct((M, n1, n2), jnp.uint32),
        interpret=interpret,
    )(
        q.reshape(M, 1), qinv.reshape(M, 1),
        ipsi1_exp, tw_mid_inv, ipsi2_exp, x.reshape(M, n2, n1),
    )
    return out.reshape(M, N)
