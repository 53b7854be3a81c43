"""Pallas TPU kernel for the 4-step negacyclic NTT / iNTT.

One kernel instance transforms one RNS limb: the [n1, n2] coefficient tile
is loaded into VMEM once, all butterfly stages + the mid twiddle + the
transpose happen on-chip, and the result is written back — the VMEM
working-set discipline the reference models as its per-cluster scratchpad
(mem.h:214-463) and 4-phase NTTU pipeline (Components.cpp:380-569). The
grid runs over limbs (the reference's limb-per-cluster parallelism,
Driver.h:158), with Pallas double-buffering consecutive limbs' DMA against
compute.

Kernel-level choices (all bit-exact vs the jnp/Montgomery graph path,
asserted in tests):

* Constant multiplies use Shoup pairs (w, floor(w*2^32/q)) — ~20% fewer
  hardware multiplies than Montgomery REDC and no dependence on qinv.
* Harvey-style LAZY reduction, extra-lazy: the Shoup high word is the
  3-multiply approximation (modmath.mulhi32_approx, err <= 1), so each
  product lands in [0, 3q) and butterflies keep values in [0, 6q) forward
  / [0, 3q) inverse — wrap-free because numtheory.PRIME_CAP bounds q below
  2^32/6. The u half pays one cond-sub-3q at stage entry; values are
  reduced to [0, q) once at kernel exit.
* Stages with H >= 8 (sublane tile) run as sliced butterflies that
  multiply only the v half; the three sub-tile stages (H = 4, 2, 1) use
  sublane rolls with (row & H) masks — everything stays a 2-D [n, m]
  vector op (no 1-D reshapes, no gathers).
* Per-block stage twiddles are pre-expanded host-side into [n, log2 n]
  columns (NttBasis.pfwd/pinv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import shoup_mul_lazy3

_MIN_SLICE_H = 8  # sublane tile for uint32; below this, slices relayout


def _swap_rows_fwd(a: jnp.ndarray) -> jnp.ndarray:
    """Exchange row-bit roles: row hi*8 + lo -> lo*(n/8) + hi.

    The three H < 8 stages pair rows within a sublane tile, which forces
    the Shoup multiply over the FULL tile plus two sublane rolls per
    stage (2.8x the cost of a sliced stage, measured). After this swap
    those stages pair at H' = H*(n/8) >= 8 and run in the cheap sliced
    form; one swap costs ~0.08 us over the copy floor at [256, 256]."""
    n, m = a.shape
    g = n // 8
    return a.reshape(g, 8, m).swapaxes(0, 1).reshape(n, m)


def _swap_rows_inv(a: jnp.ndarray) -> jnp.ndarray:
    n, m = a.shape
    g = n // 8
    return a.reshape(8, g, m).swapaxes(0, 1).reshape(n, m)


def _roll_rows(a: jnp.ndarray, shift: int, interpret: bool) -> jnp.ndarray:
    if interpret:
        return jnp.roll(a, shift, axis=0)
    return pltpu.roll(a, shift, axis=0)


def _partner(a: jnp.ndarray, H: int, first, interpret: bool) -> jnp.ndarray:
    """partner[r] = a[r ^ H]: a[r+H] on first-half rows, a[r-H] on second."""
    n = a.shape[0]
    down = _roll_rows(a, (-H) % n, interpret)  # a[r+H]
    up = _roll_rows(a, H, interpret)  # a[r-H]
    return jnp.where(first, down, up)


def _csub(a, m):
    """Conditional subtract: a - m if a >= m (single compare+select)."""
    return jnp.where(a >= m, a - m, a)


def _ct_stage_slice(a, w_col, wsh_col, H, q):
    """One lazy CT stage via sublane-aligned slicing. In: [0,6q), out: [0,6q)."""
    n, m = a.shape
    B = n // (2 * H)
    a3 = a.reshape(B, 2 * H, m)
    w3 = w_col.reshape(B, 2 * H, 1)
    wsh3 = wsh_col.reshape(B, 2 * H, 1)
    q3 = q + q + q
    u = _csub(a3[:, :H], q3)  # [0, 3q)
    v = shoup_mul_lazy3(a3[:, H:], w3[:, H:], wsh3[:, H:], q)  # [0, 3q)
    return jnp.concatenate([u + v, u - v + q3], axis=1).reshape(n, m)


def _gs_stage_slice(a, w_col, wsh_col, H, q):
    """One lazy GS stage. In: [0,3q), out: [0,3q)."""
    n, m = a.shape
    B = n // (2 * H)
    a3 = a.reshape(B, 2 * H, m)
    w3 = w_col.reshape(B, 2 * H, 1)
    wsh3 = wsh_col.reshape(B, 2 * H, 1)
    q3 = q + q + q
    u = a3[:, :H]
    v = a3[:, H:]
    s0 = _csub(u + v, q3)  # [0, 3q)
    s1 = shoup_mul_lazy3(u - v + q3, w3[:, H:], wsh3[:, H:], q)  # [0, 3q)
    return jnp.concatenate([s0, s1], axis=1).reshape(n, m)


def _ct_stage_roll(a, w_col, wsh_col, H, q, interpret):
    n = a.shape[0]
    row = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
    first = (row & H) == 0
    q3 = q + q + q
    p = _partner(a, H, first, interpret)
    # v = partner on first rows, self on second; u is the other one.
    u = _csub(jnp.where(first, a, p), q3)
    t = shoup_mul_lazy3(jnp.where(first, p, a), w_col, wsh_col, q)
    return jnp.where(first, u + t, u - t + q3)


def _gs_stage_roll(a, w_col, wsh_col, H, q, interpret):
    n = a.shape[0]
    row = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
    first = (row & H) == 0
    q3 = q + q + q
    p = _partner(a, H, first, interpret)
    # first rows: u + v; second rows: (u - v) * w with u = partner, v = a.
    s1 = shoup_mul_lazy3(p - a + q3, w_col, wsh_col, q)
    return jnp.where(first, _csub(a + p, q3), s1)


def _use_swap(n: int) -> bool:
    """Row-bit swap applies when the swapped fine stages are themselves
    sliceable: H' = H*(n/8) >= 8 for H = 1 requires n >= 64. The twiddle
    tables for the fine stages are pre-permuted host-side under the SAME
    condition (context.DeviceContext._expand)."""
    return n >= 8 * _MIN_SLICE_H


def _ct_stages_val(a, w_cols, wsh_cols, q, interpret):
    """CT butterflies: a [n, m]; w_cols/wsh_cols [n, log2(n)] Shoup pairs."""
    n = a.shape[0]
    logn = n.bit_length() - 1
    swapped = False
    for s in range(logn):
        H = n >> (s + 1)
        w = w_cols[:, s: s + 1]
        wsh = wsh_cols[:, s: s + 1]
        if H >= _MIN_SLICE_H:
            a = _ct_stage_slice(a, w, wsh, H, q)
        elif _use_swap(n):
            if not swapped:
                a = _swap_rows_fwd(a)
                swapped = True
            a = _ct_stage_slice(a, w, wsh, H * (n // 8), q)
        else:
            a = _ct_stage_roll(a, w, wsh, H, q, interpret)
    if swapped:
        a = _swap_rows_inv(a)
    return a


def _gs_stages_val(a, w_cols, wsh_cols, q, interpret):
    """GS inverse butterflies (no 1/n factor; folded into the mid table).
    The fine (H < 8) stages come FIRST here, so the row swap happens at
    entry and unwinds when the first sliced stage is reached."""
    n = a.shape[0]
    logn = n.bit_length() - 1
    swapped = False
    for s in range(logn - 1, -1, -1):
        H = n >> (s + 1)
        w = w_cols[:, s: s + 1]
        wsh = wsh_cols[:, s: s + 1]
        if H >= _MIN_SLICE_H:
            if swapped:
                a = _swap_rows_inv(a)
                swapped = False
            a = _gs_stage_slice(a, w, wsh, H, q)
        elif _use_swap(n):
            if not swapped:
                a = _swap_rows_fwd(a)
                swapped = True
            a = _gs_stage_slice(a, w, wsh, H * (n // 8), q)
        else:
            a = _gs_stage_roll(a, w, wsh, H, q, interpret)
    if swapped:
        a = _swap_rows_inv(a)
    return a


def _make_ntt_kernel(interpret: bool):
    def kernel(q_ref, p1_ref, p1s_ref, mid_ref, mids_ref, p2_ref, p2s_ref,
               x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = x_ref[0]  # [n1, n2], [0, q)
        a = _ct_stages_val(a, p1_ref[0], p1s_ref[0], q, interpret)  # [0,6q)
        a = shoup_mul_lazy3(a, mid_ref[0], mids_ref[0], q)  # [0, 3q)
        a = a.T  # [n2, n1]
        a = _ct_stages_val(a, p2_ref[0], p2s_ref[0], q, interpret)  # [0,6q)
        o_ref[0] = _csub(_csub(_csub(a, 4 * q), q + q), q)

    return kernel


def _make_intt_kernel(interpret: bool):
    def kernel(q_ref, ip1_ref, ip1s_ref, midi_ref, midis_ref, ip2_ref,
               ip2s_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = x_ref[0]  # [n2, n1], [0, q)
        a = _gs_stages_val(a, ip2_ref[0], ip2s_ref[0], q, interpret)  # <3q
        a = a.T  # [n1, n2]
        a = shoup_mul_lazy3(a, midi_ref[0], midis_ref[0], q)  # [0, 3q)
        a = _gs_stages_val(a, ip1_ref[0], ip1s_ref[0], q, interpret)  # <3q
        o_ref[0] = _csub(_csub(a, q + q), q)

    return kernel


def _slab(*shape, mod=None):
    """Per-limb slab: block [1, ...] along the leading (limb) grid axis.

    mod: when the grid covers rep copies of an M-row basis (batched
    transforms of several arrays over the SAME primes — e.g. both key
    components of a ModDown), table slabs index i % M so the tables are
    never duplicated in HBM."""
    nd = len(shape)
    if mod is None:
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec(
        (1,) + shape, lambda i: (jax.lax.rem(i, mod),) + (0,) * nd,
        memory_space=pltpu.VMEM,
    )


_SMEM_FULL = pl.BlockSpec(memory_space=pltpu.SMEM)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "interpret", "rep"))
def ntt_pallas(x, q, pfwd, *, n1, n2, interpret=False, rep=1):
    """x: [rep*M, n1, n2] coeff tiles; q: [M]; pfwd: Shoup table tuple (see
    NttBasis). Returns [rep*M, n2, n1] eval tiles (the 4-step's natural
    output layout — kept 3-D everywhere on device so kernel boundaries
    never pay an XLA tiled-layout relayout). rep > 1 transforms rep
    stacked arrays over the SAME basis in one grid (table slabs index
    i % M, so tables are fetched per row but never duplicated)."""
    Mt = x.shape[0]
    Mb = Mt // rep
    p1, p1s, mid, mids, p2, p2s = pfwd
    l1 = n1.bit_length() - 1
    l2 = n2.bit_length() - 1
    qq = jnp.tile(q, rep) if rep > 1 else q
    mod = Mb if rep > 1 else None
    return pl.pallas_call(
        _make_ntt_kernel(interpret),
        grid=(Mt,),
        in_specs=[
            _SMEM_FULL,
            _slab(n1, l1, mod=mod), _slab(n1, l1, mod=mod),
            _slab(n1, n2, mod=mod), _slab(n1, n2, mod=mod),
            _slab(n2, l2, mod=mod), _slab(n2, l2, mod=mod),
            _slab(n1, n2),
        ],
        out_specs=_slab(n2, n1),
        out_shape=jax.ShapeDtypeStruct((Mt, n2, n1), jnp.uint32),
        interpret=interpret,
    )(qq.reshape(Mt, 1), p1, p1s, mid, mids, p2, p2s, x)


# --------------------------------------------------------------------------
# Phase-split kernels: the two device-local halves of the 4-step transform
# when the coefficient (trailing) axis is sharded over a mesh axis. The
# inter-transpose between them runs as an ICI all_to_all OUTSIDE the kernel
# (ops/ntt.py `_ntt_sharded`) — the reference's interTrans stage
# (config_4.cfg:48, src/Components.cpp:411-419) as a real collective.
# Each kernel reduces its output to [0, q) so the wire format is canonical.
# --------------------------------------------------------------------------
def _make_ntt_phase1_kernel(interpret: bool):
    def kernel(q_ref, p1_ref, p1s_ref, mid_ref, mids_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = x_ref[0]  # [n1, c] local columns, [0, q)
        a = _ct_stages_val(a, p1_ref[0], p1s_ref[0], q, interpret)  # [0,6q)
        a = shoup_mul_lazy3(a, mid_ref[0], mids_ref[0], q)  # [0, 3q)
        o_ref[0] = _csub(_csub(a, q + q), q)

    return kernel


def _make_ntt_phase2_kernel(interpret: bool):
    def kernel(q_ref, p2_ref, p2s_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = x_ref[0]  # [n2, c] local columns, [0, q)
        a = _ct_stages_val(a, p2_ref[0], p2s_ref[0], q, interpret)  # [0,6q)
        o_ref[0] = _csub(_csub(_csub(a, 4 * q), q + q), q)

    return kernel


def _make_intt_phase2_kernel(interpret: bool):
    def kernel(q_ref, ip2_ref, ip2s_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = x_ref[0]  # [n2, c] eval columns, [0, q)
        a = _gs_stages_val(a, ip2_ref[0], ip2s_ref[0], q, interpret)  # <3q
        o_ref[0] = _csub(_csub(a, q + q), q)

    return kernel


def _make_intt_phase1_kernel(interpret: bool):
    def kernel(q_ref, midi_ref, midis_ref, ip1_ref, ip1s_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = x_ref[0]  # [n1, c], [0, q)
        a = shoup_mul_lazy3(a, midi_ref[0], midis_ref[0], q)  # [0, 3q)
        a = _gs_stages_val(a, ip1_ref[0], ip1s_ref[0], q, interpret)  # <3q
        o_ref[0] = _csub(_csub(a, q + q), q)

    return kernel


@functools.partial(jax.jit, static_argnames=("n1", "c", "interpret"))
def ntt_phase1_pallas(x, q, p1, p1s, mid, mids, *, n1, c, interpret=False):
    """Stage-1 butterflies + mid twiddle on [M, n1, c] local column slices
    (c = n2 / n_shards; mid/mids are the device-local mid-twiddle column
    slices). Output [M, n1, c] in [0, q)."""
    M = x.shape[0]
    l1 = n1.bit_length() - 1
    return pl.pallas_call(
        _make_ntt_phase1_kernel(interpret),
        grid=(M,),
        in_specs=[
            _SMEM_FULL,
            _slab(n1, l1), _slab(n1, l1),
            _slab(n1, c), _slab(n1, c),
            _slab(n1, c),
        ],
        out_specs=_slab(n1, c),
        out_shape=jax.ShapeDtypeStruct((M, n1, c), jnp.uint32),
        interpret=interpret,
    )(q.reshape(M, 1), p1, p1s, mid, mids, x)


@functools.partial(jax.jit, static_argnames=("n2", "c", "interpret"))
def ntt_phase2_pallas(x, q, p2, p2s, *, n2, c, interpret=False):
    """Stage-2 butterflies on [M, n2, c] (c = n1 / n_shards after the
    inter-transpose). Output [M, n2, c] eval columns in [0, q)."""
    M = x.shape[0]
    l2 = n2.bit_length() - 1
    return pl.pallas_call(
        _make_ntt_phase2_kernel(interpret),
        grid=(M,),
        in_specs=[
            _SMEM_FULL,
            _slab(n2, l2), _slab(n2, l2),
            _slab(n2, c),
        ],
        out_specs=_slab(n2, c),
        out_shape=jax.ShapeDtypeStruct((M, n2, c), jnp.uint32),
        interpret=interpret,
    )(q.reshape(M, 1), p2, p2s, x)


@functools.partial(jax.jit, static_argnames=("n2", "c", "interpret"))
def intt_phase2_pallas(x, q, ip2, ip2s, *, n2, c, interpret=False):
    """Inverse stage-2 (GS) butterflies on [M, n2, c] eval column slices."""
    M = x.shape[0]
    l2 = n2.bit_length() - 1
    return pl.pallas_call(
        _make_intt_phase2_kernel(interpret),
        grid=(M,),
        in_specs=[
            _SMEM_FULL,
            _slab(n2, l2), _slab(n2, l2),
            _slab(n2, c),
        ],
        out_specs=_slab(n2, c),
        out_shape=jax.ShapeDtypeStruct((M, n2, c), jnp.uint32),
        interpret=interpret,
    )(q.reshape(M, 1), ip2, ip2s, x)


@functools.partial(jax.jit, static_argnames=("n1", "c", "interpret"))
def intt_phase1_pallas(x, q, midi, midis, ip1, ip1s, *, n1, c, interpret=False):
    """Inverse mid twiddle + stage-1 (GS) butterflies on [M, n1, c] coeff
    column slices. Output [M, n1, c] coeff columns in [0, q)."""
    M = x.shape[0]
    l1 = n1.bit_length() - 1
    return pl.pallas_call(
        _make_intt_phase1_kernel(interpret),
        grid=(M,),
        in_specs=[
            _SMEM_FULL,
            _slab(n1, c), _slab(n1, c),
            _slab(n1, l1), _slab(n1, l1),
            _slab(n1, c),
        ],
        out_specs=_slab(n1, c),
        out_shape=jax.ShapeDtypeStruct((M, n1, c), jnp.uint32),
        interpret=interpret,
    )(q.reshape(M, 1), midi, midis, ip1, ip1s, x)


# --------------------------------------------------------------------------
# LANE-PACKED phase kernels (narrow-width sharded shards).
#
# Measured (WIDTH_SCALING.json): the butterfly kernels stop getting faster
# below c = 128 columns — less than one full 128-lane VPU register per
# instruction, so per-element issue cost doubles each halving while the
# bconv (MXU) kernel keeps scaling. These variants pack k = 128/c limbs
# side-by-side into the lane axis (lane block j = limb j's columns), so
# every instruction stays full-width. Per-limb constants (q, stage
# twiddles, mid twiddles) become per-lane VECTORS, pre-broadcast
# host-side by pack_phase_tables; the butterfly row structure is
# lane-independent, so the stage math is unchanged. Bit-exact vs the
# per-limb kernels (tests/test_pallas_kernels.py).
# --------------------------------------------------------------------------
def _ct_stage_slice_v(a, w, wsh, H, qrow):
    """_ct_stage_slice with per-lane twiddles/q: a, w, wsh [n, m];
    qrow [1, m]."""
    n, m = a.shape
    B = n // (2 * H)
    a3 = a.reshape(B, 2 * H, m)
    w3 = w.reshape(B, 2 * H, m)
    wsh3 = wsh.reshape(B, 2 * H, m)
    q1 = qrow.reshape(1, 1, m)
    q3 = q1 + q1 + q1
    u = _csub(a3[:, :H], q3)
    v = shoup_mul_lazy3(a3[:, H:], w3[:, H:], wsh3[:, H:], q1)
    return jnp.concatenate([u + v, u - v + q3], axis=1).reshape(n, m)


def _gs_stage_slice_v(a, w, wsh, H, qrow):
    n, m = a.shape
    B = n // (2 * H)
    a3 = a.reshape(B, 2 * H, m)
    w3 = w.reshape(B, 2 * H, m)
    wsh3 = wsh.reshape(B, 2 * H, m)
    q1 = qrow.reshape(1, 1, m)
    q3 = q1 + q1 + q1
    u = a3[:, :H]
    v = a3[:, H:]
    s0 = _csub(u + v, q3)
    s1 = shoup_mul_lazy3(u - v + q3, w3[:, H:], wsh3[:, H:], q1)
    return jnp.concatenate([s0, s1], axis=1).reshape(n, m)


def _ct_stages_val_packed(a, w_st, wsh_st, qrow):
    """CT butterflies with per-lane tables: a [n, m]; w_st/wsh_st
    [log2 n, n, m] pre-broadcast per stage (pack_phase_tables); qrow
    [1, m]. Requires _use_swap(n) (all stages sliced)."""
    n = a.shape[0]
    logn = n.bit_length() - 1
    assert _use_swap(n)
    swapped = False
    for s in range(logn):
        H = n >> (s + 1)
        if H >= _MIN_SLICE_H:
            a = _ct_stage_slice_v(a, w_st[s], wsh_st[s], H, qrow)
        else:
            if not swapped:
                a = _swap_rows_fwd(a)
                swapped = True
            a = _ct_stage_slice_v(a, w_st[s], wsh_st[s], H * (n // 8), qrow)
    if swapped:
        a = _swap_rows_inv(a)
    return a


def _gs_stages_val_packed(a, w_st, wsh_st, qrow):
    n = a.shape[0]
    logn = n.bit_length() - 1
    assert _use_swap(n)
    swapped = False
    for s in range(logn - 1, -1, -1):
        H = n >> (s + 1)
        if H >= _MIN_SLICE_H:
            if swapped:
                a = _swap_rows_inv(a)
                swapped = False
            a = _gs_stage_slice_v(a, w_st[s], wsh_st[s], H, qrow)
        else:
            if not swapped:
                a = _swap_rows_fwd(a)
                swapped = True
            a = _gs_stage_slice_v(a, w_st[s], wsh_st[s], H * (n // 8), qrow)
    if swapped:
        a = _swap_rows_inv(a)
    return a


def _make_ntt_phase1_packed_kernel(interpret: bool):
    def kernel(q_ref, p1_ref, p1s_ref, mid_ref, mids_ref, x_ref, o_ref):
        q = q_ref[0]  # [1, m] per-lane primes
        a = x_ref[0]  # [n1, m] = k packed limbs' columns
        a = _ct_stages_val_packed(a, p1_ref[0], p1s_ref[0], q)
        a = shoup_mul_lazy3(a, mid_ref[0], mids_ref[0], q)
        q2 = q + q
        a = _csub(a, q2)
        o_ref[0] = _csub(a, q)

    return kernel


def _make_ntt_phase2_packed_kernel(interpret: bool):
    def kernel(q_ref, p2_ref, p2s_ref, x_ref, o_ref):
        q = q_ref[0]
        a = x_ref[0]
        a = _ct_stages_val_packed(a, p2_ref[0], p2s_ref[0], q)
        q2 = q + q
        a = _csub(a, q2 + q2)
        a = _csub(a, q2)
        o_ref[0] = _csub(a, q)

    return kernel


def _make_intt_phase2_packed_kernel(interpret: bool):
    def kernel(q_ref, ip2_ref, ip2s_ref, x_ref, o_ref):
        q = q_ref[0]
        a = x_ref[0]
        a = _gs_stages_val_packed(a, ip2_ref[0], ip2s_ref[0], q)
        a = _csub(a, q + q)
        o_ref[0] = _csub(a, q)

    return kernel


def _make_intt_phase1_packed_kernel(interpret: bool):
    def kernel(q_ref, midi_ref, midis_ref, ip1_ref, ip1s_ref, x_ref, o_ref):
        q = q_ref[0]
        a = x_ref[0]
        a = shoup_mul_lazy3(a, midi_ref[0], midis_ref[0], q)
        a = _gs_stages_val_packed(a, ip1_ref[0], ip1s_ref[0], q)
        a = _csub(a, q + q)
        o_ref[0] = _csub(a, q)

    return kernel


def _packed_call(kernel, G, n, m, tables, x, interpret):
    specs = [_slab(1, m)]
    for t in tables:
        specs.append(_slab(*t.shape[1:]))
    specs.append(_slab(n, m))
    return pl.pallas_call(
        kernel, grid=(G,),
        in_specs=specs,
        out_specs=_slab(n, m),
        out_shape=jax.ShapeDtypeStruct((G, n, m), jnp.uint32),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("n1", "interpret"))
def ntt_phase1_packed_pallas(x, qrow, p1p, p1sp, midp, midsp, *, n1,
                             interpret=False):
    """Lane-packed phase 1: x [G, n1, m] (m = k*c lanes, k limbs packed);
    qrow [G, 1, m]; p1p/p1sp [G, log2(n1), n1, m]; midp/midsp [G, n1, m]
    (pack_phase_tables output). Output [G, n1, m] in [0, q) per lane."""
    G = x.shape[0]
    m = x.shape[2]
    return _packed_call(
        _make_ntt_phase1_packed_kernel(interpret), G, n1, m,
        (p1p, p1sp, midp, midsp), x, interpret,
    )(qrow, p1p, p1sp, midp, midsp, x)


@functools.partial(jax.jit, static_argnames=("n2", "interpret"))
def ntt_phase2_packed_pallas(x, qrow, p2p, p2sp, *, n2, interpret=False):
    """Lane-packed phase 2: x [G, n2, m] post-transpose columns."""
    G = x.shape[0]
    m = x.shape[2]
    return _packed_call(
        _make_ntt_phase2_packed_kernel(interpret), G, n2, m,
        (p2p, p2sp), x, interpret,
    )(qrow, p2p, p2sp, x)


@functools.partial(jax.jit, static_argnames=("n2", "interpret"))
def intt_phase2_packed_pallas(x, qrow, ip2p, ip2sp, *, n2, interpret=False):
    G = x.shape[0]
    m = x.shape[2]
    return _packed_call(
        _make_intt_phase2_packed_kernel(interpret), G, n2, m,
        (ip2p, ip2sp), x, interpret,
    )(qrow, ip2p, ip2sp, x)


@functools.partial(jax.jit, static_argnames=("n1", "interpret"))
def intt_phase1_packed_pallas(x, qrow, midip, midisp, ip1p, ip1sp, *, n1,
                              interpret=False):
    G = x.shape[0]
    m = x.shape[2]
    return _packed_call(
        _make_intt_phase1_packed_kernel(interpret), G, n1, m,
        (midip, midisp, ip1p, ip1sp), x, interpret,
    )(qrow, midip, midisp, ip1p, ip1sp, x)


def pack_phase_tables(q, stage_pl, stage_sh, mid_pl, mid_sh, k, c,
                      col0=0):
    """Host packing for the lane-packed kernels. Inputs are the per-limb
    NttBasis.pfwd/pinv arrays: q [M]; stage tables [M, n, log2 n]; mid
    tables [M, n, n_cols_full] (column slice [col0, col0+c) is taken —
    the device-local mid columns; pass None for mid-free phases, e.g.
    forward phase 2). Returns (qrow [G, 1, k*c],
    stage_p [G, log2 n, n, k*c], stage_s, mid_p [G, n, k*c], mid_s) with
    G = M // k (M must divide; pad rows upstream); mid outputs are None
    when mid_pl is None."""
    import numpy as np

    M, n, logn = stage_pl.shape
    assert M % k == 0, (M, k)
    G = M // k
    m = k * c

    def group(a):  # [M, ...] -> [G, k, ...]
        return np.asarray(a).reshape((G, k) + a.shape[1:])

    qg = group(q)  # [G, k]
    qrow = np.repeat(qg, c, axis=1).reshape(G, 1, m)

    def pack_stage(t):  # [M, n, logn] -> [G, logn, n, m]
        tg = group(t)  # [G, k, n, logn]
        tg = np.transpose(tg, (0, 3, 2, 1))  # [G, logn, n, k]
        return np.repeat(tg, c, axis=3)  # broadcast each limb over c lanes

    def pack_mid(t):  # [M, n, full] -> [G, n, m]
        tg = group(t[:, :, col0:col0 + c])  # [G, k, n, c]
        return np.transpose(tg, (0, 2, 1, 3)).reshape(G, n, m)

    return (
        jnp.asarray(qrow.astype(np.uint32)),
        jnp.asarray(pack_stage(stage_pl)),
        jnp.asarray(pack_stage(stage_sh)),
        jnp.asarray(pack_mid(mid_pl)) if mid_pl is not None else None,
        jnp.asarray(pack_mid(mid_sh)) if mid_sh is not None else None,
    )


def pack_k_for(n1: int, n2: int, ns: int) -> int:
    """Lane-group size k for the packed narrow-shard routing, or 0 when
    packing is off for this shape. Single source of truth for the gate
    (context.ntt_basis builds tables with it; sharded.ici_bytes_per_op
    bills padded lane-group rows with it): square tiles (shared k for
    both phases), sliceable stages (n >= 64), and k >= 4 — at k = 2 the
    pack/unpack relayouts outweigh the halved launches (measured,
    SCALING v2)."""
    if not (n1 == n2 and n1 >= 64 and ns > 0):
        return 0
    c = n2 // ns
    if c <= 0 or c > 32:
        return 0
    return 128 // c


def pack_limb_lanes(x, k):
    """[M, n, c] -> [M//k, n, k*c]: lane block j = limb j's columns."""
    M, n, c = x.shape
    return x.reshape(M // k, k, n, c).swapaxes(1, 2).reshape(M // k, n, k * c)


def unpack_limb_lanes(y, k, c):
    """Inverse of pack_limb_lanes."""
    G, n, m = y.shape
    return y.reshape(G, n, k, c).swapaxes(1, 2).reshape(G * k, n, c)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "interpret", "rep"))
def intt_pallas(x, q, pinv, *, n1, n2, interpret=False, rep=1):
    """x: [rep*M, n2, n1] eval tiles -> [rep*M, n1, n2] coeff tiles
    (rep as in ntt_pallas)."""
    Mt = x.shape[0]
    Mb = Mt // rep
    ip1, ip1s, midi, midis, ip2, ip2s = pinv
    l1 = n1.bit_length() - 1
    l2 = n2.bit_length() - 1
    qq = jnp.tile(q, rep) if rep > 1 else q
    mod = Mb if rep > 1 else None
    return pl.pallas_call(
        _make_intt_kernel(interpret),
        grid=(Mt,),
        in_specs=[
            _SMEM_FULL,
            _slab(n1, l1, mod=mod), _slab(n1, l1, mod=mod),
            _slab(n1, n2, mod=mod), _slab(n1, n2, mod=mod),
            _slab(n2, l2, mod=mod), _slab(n2, l2, mod=mod),
            _slab(n2, n1),
        ],
        out_specs=_slab(n1, n2),
        out_shape=jax.ShapeDtypeStruct((Mt, n1, n2), jnp.uint32),
        interpret=interpret,
    )(qq.reshape(Mt, 1), ip1, ip1s, midi, midis, ip2, ip2s, x)
