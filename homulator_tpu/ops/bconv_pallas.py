"""Pallas TPU kernel for RNS base-conversion step 2 (the BCONVU datapath).

out[j, :] = sum_i xhat[i, :] * mat[j, i]  mod q_j

The jnp graph version materializes an [Mout, N] intermediate per input
limb in HBM; this kernel keeps the [Mout, TILE] accumulator in VMEM across
the unrolled limb loop and writes each output tile once — the real version
of the reference's systolic accumulate-along-limbs MAC grid
(Components.cpp:282-287). Each term is a full [Mout, TILE] VPU op
(input row broadcast against the matrix column), so all sublanes stay
busy. Matrix constants are Shoup pairs (plain + floor(w*2^32/q)).

Grid: tiles of the coefficient axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import modadd, shoup_mul

DEFAULT_TILE = 2048


def _bconv_kernel(q_ref, mat_ref, matsh_ref, x_ref, o_ref, *, nd: int):
    q = q_ref[:]        # [Mout, 1]
    mat = mat_ref[:]    # [Mout, nd]
    matsh = matsh_ref[:]
    x = x_ref[:]        # [nd, T]
    acc = shoup_mul(x[0:1], mat[:, 0:1], matsh[:, 0:1], q)  # [Mout, T]
    for t in range(1, nd):
        acc = modadd(
            acc, shoup_mul(x[t: t + 1], mat[:, t: t + 1], matsh[:, t: t + 1], q), q
        )
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def bconv_step2_pallas(xhat, mat_pl, mat_sh, out_q, *, tile=DEFAULT_TILE,
                       interpret=False):
    """xhat: [nd, N]; mat_pl/mat_sh: [Mout, nd] Shoup pair; out_q: [Mout].
    Returns [Mout, N]."""
    nd, N = xhat.shape
    m_out = mat_pl.shape[0]
    tile = min(tile, N)
    kernel = functools.partial(_bconv_kernel, nd=nd)
    fixed = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[
            fixed,  # q      [Mout, 1]
            fixed,  # mat    [Mout, nd]
            fixed,  # mat_sh [Mout, nd]
            pl.BlockSpec((nd, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_out, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_out, N), jnp.uint32),
        interpret=interpret,
    )(out_q.reshape(m_out, 1), mat_pl, mat_sh, xhat)
