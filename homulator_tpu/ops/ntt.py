"""4-step negacyclic NTT / iNTT over RNS limb arrays (jnp graph version).

The real datapath behind the reference's NTTU model (include/Components.h:
297-345; README.md:60-62 "modeled after SHARP"): its
phase1 -> intra-transpose -> inter-transpose -> phase2 pipeline is exactly
the 4-step factorization N = n1*n2 used here:

  step 1: n2 parallel size-n1 merged-twist negacyclic sub-NTTs along the
          leading axis (butterflies are full-row VPU ops, lanes = n2 axis)
  step 2: mid twiddle multiply (one fused constant pass; also pre-twists
          the cyclic step-4 DFT into negacyclic form — see params.py)
  step 3: [n1, n2] transpose (the "interTrans" stage; on a sharded
          coefficient axis this becomes an ICI all_to_all)
  step 4: n1 parallel size-n2 sub-NTTs

Output ordering is the network's natural permuted evaluation order
(params.NttTables.eval_index); all pointwise consumers are order-agnostic
and automorphism gathers are precomputed in this order.

x: uint32[M, N] standard-domain residues, one row per RNS limb.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..context import NttBasis
from .modmath import modadd, modsub, mont_mul


def _ct_stages(x: jnp.ndarray, tws: Tuple[jnp.ndarray, ...], q, qinv) -> jnp.ndarray:
    """CT DIT butterfly network along axis -2 of [M, n, m]."""
    M, n, m = x.shape
    q4 = q.reshape(M, 1, 1, 1)
    qi4 = qinv.reshape(M, 1, 1, 1)
    for s, tw in enumerate(tws):
        B = 1 << s
        H = n >> (s + 1)
        xr = x.reshape(M, B, 2, H, m)
        u = xr[:, :, 0]
        v = mont_mul(xr[:, :, 1], tw[:, :, None, None], q4, qi4)
        x = jnp.stack([modadd(u, v, q4), modsub(u, v, q4)], axis=2).reshape(M, n, m)
    return x


def _gs_stages(x: jnp.ndarray, tws: Tuple[jnp.ndarray, ...], q, qinv) -> jnp.ndarray:
    """GS inverse butterfly network along axis -2 (no 1/n factor; it is
    folded into tw_mid_inv)."""
    M, n, m = x.shape
    q4 = q.reshape(M, 1, 1, 1)
    qi4 = qinv.reshape(M, 1, 1, 1)
    for s in range(len(tws) - 1, -1, -1):
        B = 1 << s
        H = n >> (s + 1)
        xr = x.reshape(M, B, 2, H, m)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        s0 = modadd(u, v, q4)
        s1 = mont_mul(modsub(u, v, q4), tws[s][:, :, None, None], q4, qi4)
        x = jnp.stack([s0, s1], axis=2).reshape(M, n, m)
    return x


def ntt(x: jnp.ndarray, nb: NttBasis) -> jnp.ndarray:
    """x: [M, n1, n2] coeff tiles -> [M, n2, n1] eval tiles. Device arrays
    are 3-D everywhere (coeff = [n1, n2], eval = [n2, n1]); the flat
    order is only materialized at host boundaries."""
    if nb.use_pallas:
        from .ntt_pallas import ntt_pallas

        return ntt_pallas(
            x, nb.q, nb.pfwd, n1=nb.n1, n2=nb.n2, interpret=nb.interpret,
        )
    M = x.shape[0]
    q3 = nb.q.reshape(M, 1, 1)
    qi3 = nb.qinv.reshape(M, 1, 1)
    y = _ct_stages(x, nb.stage1, nb.q, nb.qinv)
    y = mont_mul(y, nb.tw_mid, q3, qi3)
    y = y.transpose(0, 2, 1)
    y = _ct_stages(y, nb.stage2, nb.q, nb.qinv)
    return y


def intt(x: jnp.ndarray, nb: NttBasis) -> jnp.ndarray:
    """x: [M, n2, n1] eval tiles -> [M, n1, n2] coeff tiles."""
    if nb.use_pallas:
        from .ntt_pallas import intt_pallas

        return intt_pallas(
            x, nb.q, nb.pinv, n1=nb.n1, n2=nb.n2, interpret=nb.interpret,
        )
    M = x.shape[0]
    q3 = nb.q.reshape(M, 1, 1)
    qi3 = nb.qinv.reshape(M, 1, 1)
    y = _gs_stages(x, nb.istage2, nb.q, nb.qinv)
    y = y.transpose(0, 2, 1)
    y = mont_mul(y, nb.tw_mid_inv, q3, qi3)
    y = _gs_stages(y, nb.istage1, nb.q, nb.qinv)
    return y
