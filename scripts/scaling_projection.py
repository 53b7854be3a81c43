#!/usr/bin/env python
"""Multi-chip scaling projection v2 from single-chip measurements.

Real multi-chip hardware is not attached here (one tunneled v5e chip), but
every input of a scaling projection IS measurable or known:

  per-device COMPUTE  — measured ON CHIP by running the actual shard_map
                        body code as a plain jitted program at device-0's
                        exact per-shard shapes, with each collective
                        replaced by a shape-preserving local stand-in.
                        Anchored at TWO levels (35, 11) so the dispatch
                        model can interpolate over level.
  overlappable COMPUTE — the phase sections whose dependency structure
                        lets them execute while a gather is in flight
                        (limb path, r5: chunk-pipelined gathers + the
                        deferred main-row inner product), measured as
                        their own chained programs. These become the
                        overlap credit H in the model — a STRUCTURAL
                        bound (min(hideable bytes, measured independent
                        compute)), not a guess.
  per-device ICI      — exact byte counts (ici_bytes_per_op[_limb]),
                        HLO-reconciled by tests/test_sharding.py.
  link rate / latency — v5e constants, swept as a sensitivity grid; the
                        2-host rows add a DCN (bandwidth, latency) grid
                        for the mesh boundary that crosses hosts.

Model per (op, axis, ns, level) — shared with the CLI's auto dispatch
(homulator_tpu/parallel/dispatch_model.py, whose measured constants THIS
script generates):

  T = T_compute + ICI/BW + colls * t_coll - H        (H = 0 on coeff)

Efficiency = T(1) / (ns * T(ns)) against BASELINE.md's >= 70 % north-star
and the reference's own measured cluster scaling (BASELINE.md:54-66, 98 %
at 8; its NoC overlaps copies with unit pipelines by construction,
src/mem.cpp:78-147 — H prices how much of that overlap our dependency
structure exposes).

2-host rows: a mesh axis of size ns split across 2 hosts sends ns/2 of
each device's (ns-1) received blocks over DCN; ICI and DCN are distinct
fabrics, so T_comm = max(intra/BW_ici, inter/BW_dcn) and collectives pay
the DCN launch latency. (BASELINE.md:79: ">= 70 % at 2 hosts".)

Writes SCALING.json + homulator_tpu/parallel/_scaling_measured.py.
Run on the TPU (tens of minutes on a cold compile cache).
"""

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

# Center constants come from the SHARED dispatch model so the CLI's
# routing and this projection can never drift apart (they are the same
# numbers by construction).
from homulator_tpu.parallel.dispatch_model import BW0, TCOLL0  # noqa: E402

LEVELS = (35, 11)  # compute anchors (level 35 = headline; 11 = low anchor)
NSS = (2, 4, 8)
# v5e ICI: 4 links/chip, ~186 GB/s aggregate injection per chip (public
# spec 1600 Gbps). Effective per-device receive bandwidth for the
# gather/transpose patterns here is well below peak; BW0 = 45 GB/s is
# the conservative center, swept 2x each way.
BW_GRID = (BW0 / 2, BW0, BW0 * 2)
TCOLL_GRID = (2e-6, TCOLL0, 20e-6)
# DCN (2-host boundary): per-device effective cross-host bandwidth —
# hosts share one NIC pool (v5e pods: 100-400 Gbps/host over 4 devices),
# so the per-device center is far below ICI. Swept 2x each way.
BW_DCN_GRID = (6.25e9, 12.5e9, 25e9)
TCOLL_DCN = 25e-6
BW_DCN0 = BW_DCN_GRID[1]


def _patch_collectives(ns, ns_a2a=None):
    """Replace the collectives the shard bodies call with shape-preserving
    single-chip stand-ins (values become meaningless; compute shapes and
    kernel launches stay exactly per-shard). Bench-process-only patching.
    ns sizes the row-gather axis; ns_a2a (hybrid meshes) the transform
    all_to_all axis (defaults to ns for the 1-D paths)."""
    import jax
    import jax.numpy as jnp

    import homulator_tpu.ops.ntt as ntt_mod

    if ns_a2a is None:
        ns_a2a = ns

    def fake_all_gather(x, axis_name, *, axis=0, tiled=True):
        reps = [1] * x.ndim
        reps[axis] = ns
        return jnp.tile(x, reps)

    def fake_ppermute(x, axis_name, perm):
        return x

    def fake_axis_index(axis_name):
        return jnp.uint32(0)

    def fake_transpose_a2a(y, axis):
        # real: local [M, a, b/ns] -> local slice [M, b, a/ns] of the
        # global transpose. Stand-in with identical shapes and a
        # comparable local data movement cost.
        M, a, bl = y.shape
        z = jnp.swapaxes(y, 1, 2)  # [M, b/ns, a]
        z = jnp.tile(z, (1, ns_a2a, 1))
        return z[:, :, : a // ns_a2a]

    def fake_packed_a2a(y, axis, ns_, k):
        # real: packed [G, a, k*(b/ns)] -> a2a -> 5-D local transpose ->
        # [G, b, k*(a/ns)]. Stand-in: pretend the received blocks are the
        # local chunks — exact same element count and the same local
        # transpose cost, zero wire traffic.
        G, a, m = y.shape
        cb = m // k
        ra = a // ns_
        z = y.reshape(G, ns_, ra, k, cb)  # ns_ comes from the caller
        z = z.transpose(0, 1, 4, 3, 2)  # [G, ns, cb, k, ra]
        return z.reshape(G, ns_ * cb, k * ra)

    jax.lax.all_gather = fake_all_gather
    jax.lax.ppermute = fake_ppermute
    jax.lax.axis_index = fake_axis_index
    ntt_mod._transpose_a2a = fake_transpose_a2a
    ntt_mod._packed_transpose_a2a = fake_packed_a2a


def _shard_slice(tree, spec, axis, ns, idx=0):
    """Device-idx shard of a table pytree, driven by its PartitionSpec
    tree (the same specs shard_map uses, so the slicing is by construction
    what a real device receives)."""
    import jax
    from jax.sharding import PartitionSpec as P

    leaves_t, treedef = jax.tree_util.tree_flatten(tree)
    leaves_s, _ = jax.tree_util.tree_flatten(
        spec, is_leaf=lambda x: isinstance(x, P))
    out = []
    for a, s in zip(leaves_t, leaves_s):
        if isinstance(s, P) and axis in s and getattr(a, "size", 0):
            d = list(s).index(axis)
            sz = a.shape[d] // ns
            sl = [slice(None)] * a.ndim
            sl[d] = slice(idx * sz, (idx + 1) * sz)
            a = a[tuple(sl)]
        out.append(a)
    return jax.tree_util.tree_unflatten(treedef, out)


def main() -> int:
    global LEVELS, NSS
    smoke = "--smoke" in sys.argv  # CPU harness check: tiny params,
    # interpret-mode kernels, one mesh size, no artifact write
    if smoke:
        LEVELS = (8,)
        NSS = (4,)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from homulator_tpu import benchlib
    from homulator_tpu.api import CkksEngine, hmult_graph
    from homulator_tpu.params import get_params
    from homulator_tpu.parallel import dispatch_model
    from homulator_tpu.parallel.limb_sharded import (
        _hmult_limb_body, _hrotate_limb_body, _ip_slice,
        _limb_specs, _pick_gchunks, build_limb_tables, evk_limb_row_order,
        ici_bytes_per_op_limb, limb_collective_count, pad_main_rows,
    )
    from homulator_tpu.parallel.sharded import (
        _hrotate_body, _keyswitch_specs, _ntt_basis_specs, ici_bytes_per_op,
    )
    from homulator_tpu.ops.bconv_fused import bconv_fused
    from homulator_tpu.ops.modmath import modadd, mont_mul, to_mont

    if smoke:
        params = get_params(n=256, max_level=8, alpha=4)
        eng = CkksEngine(params, seed=1, ntt_mode="interpret")
    else:
        params = get_params(n=2**16, max_level=45, alpha=15)
        eng = CkksEngine(params, seed=1)
    eng.keygen()
    eng.gen_rotation_key(1)
    dc = eng.dc
    scale = 2.0**29
    G = _pick_gchunks(params.ntt.n1, params.ntt.n2)

    def timed(fn, *args, k1=4, k2=28):
        """Chained-loop seconds/iter; in smoke mode just execute once
        (harness/compile check, not a measurement)."""
        if smoke:
            np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(fn(*args, 1))[0].ravel()[:8]))
            return 1.0
        return benchlib.time_chained(fn, k1, k2, *args)

    out = {"levels": list(LEVELS),
           "params": {"n": params.n, "max_level": params.max_level,
                      "alpha": params.alpha},
           "gchunks": G,
           "bw_grid_GBps": [b / 1e9 for b in BW_GRID],
           "tcoll_grid_us": [t * 1e6 for t in TCOLL_GRID],
           "bw_dcn_grid_GBps": [b / 1e9 for b in BW_DCN_GRID],
           "tcoll_dcn_us": TCOLL_DCN * 1e6,
           "model": ("T = T_compute(measured, level-interpolated) + "
                     "ICI/BW + colls*t_coll - H; H = limb-axis overlap "
                     "credit min(hideable_bytes/BW, measured overlappable "
                     "compute) per gather site (see "
                     "parallel/dispatch_model.py)")}

    # ---- ns = 1 baselines (the ordinary single-chip graphs) -------------
    t1 = {}
    for lvl in LEVELS:
        m = np.zeros(params.n, dtype=np.int64)
        m[0] = int(3 * scale)
        c1 = eng.encrypt_ints(m, lvl, scale)
        c2 = eng.encrypt_ints(m, lvl, scale)
        if smoke:
            t1[lvl] = (1.0, 1.0)
        else:
            t1[lvl] = (benchlib.hmult_seconds(eng, c1, c2),
                       benchlib.hrotate_seconds(eng, c1, step=1))
        print(f"# single-chip level {lvl}: hmult {1e3*t1[lvl][0]:.3f} ms, "
              f"hrotate {1e3*t1[lvl][1]:.3f} ms", flush=True)
    out["t1_hmult_ms"] = round(1e3 * t1[LEVELS[0]][0], 4)
    out["t1_hrotate_ms"] = round(1e3 * t1[LEVELS[0]][1], 4)

    compute_ms = {}   # "op|axis|ns" -> {level: ms}
    overlap_ms = {}   # "op|ns" -> {"modup": ms, "tail": ms, "level": lvl}

    for ns in NSS:
        _patch_collectives(ns)  # re-patched per ns (stand-ins close over ns)
        c = params.ntt.n1 // ns
        for lvl in LEVELS:
            m = np.zeros(params.n, dtype=np.int64)
            m[0] = int(3 * scale)
            ct1 = eng.encrypt_ints(m, lvl, scale)
            ct2 = eng.encrypt_ints(m, lvl, scale)

            # ---- coeff axis: per-shard compute (device-0 column slices,
            # packed kernels routed automatically at c < 128) ------------
            AX = "x"
            kt = dc.keyswitch_tables(lvl, shard_axis=AX, pack_ns=ns)
            kt_l = _shard_slice(kt, _keyswitch_specs(kt, AX), AX, ns)
            lnt = dc.ntt_basis((lvl - 1,), shard_axis=AX, pack_ns=ns)
            lnt_l = _shard_slice(lnt, _ntt_basis_specs(lnt, AX), AX, ns)
            ont = dc.ntt_basis(dc.main_rows(lvl - 1), shard_axis=AX,
                               pack_ns=ns)
            ont_l = _shard_slice(ont, _ntt_basis_specs(ont, AX), AX, ns)
            rs = dc.rescale_qinv_mont(lvl)
            a_l = ct1.data[..., :c]
            b_l = ct2.data[..., :c]
            evk_l = eng.relin_key[..., :c]

            @jax.jit
            def coeff_hmult_chain(a, b, evk, kt_, l_, o_, rs_, iters):
                def body(_, carry):
                    r = hmult_graph(carry, b, evk, kt_, l_, o_, rs_)
                    return jnp.concatenate([r, carry[:, -1:]], axis=1)
                return jax.lax.fori_loop(0, iters, body, a)

            coeff_hmult = timed(
                coeff_hmult_chain, a_l, b_l, evk_l, kt_l, lnt_l, ont_l, rs)

            g = params.galois_elt(1)
            local_src, _, _ = dc.automorph_shard_route(g, ns)
            lsrc0 = local_src[0]
            rotk_l = eng.rot_keys[1][..., :c]

            @jax.jit
            def coeff_hrot_chain(a, lsrc, rotk, kt_, iters):
                def body(_, carry):
                    return _hrotate_body(carry, lsrc, rotk, kt_, AX,
                                         perm_pairs=())
                return jax.lax.fori_loop(0, iters, body, a)

            coeff_hrot = timed(coeff_hrot_chain, a_l, lsrc0, rotk_l, kt_l)

            # ---- limb axis: per-shard compute (device-0 row blocks) -----
            T = build_limb_tables(dc, lvl, ns)
            T_l = _shard_slice(T, _limb_specs(T, "limb"), "limb", ns)
            order = evk_limb_row_order(params, lvl, ns)
            B = T.sa + T.sm
            evk_rows = jnp.take(eng.relin_key, jnp.asarray(order[:B]),
                                axis=2)
            rot_rows = jnp.take(eng.rot_keys[1], jnp.asarray(order[:B]),
                                axis=2)
            a_rows = pad_main_rows(ct1.data, lvl, ns)[:, : T.sm]
            b_rows = pad_main_rows(ct2.data, lvl, ns)[:, : T.sm]
            perm = dc.automorph_perm(g)

            @jax.jit
            def limb_hmult_chain(a, b, evk, T_, iters):
                def body(_, carry):
                    return _hmult_limb_body(carry, b, evk, T_, axis="limb")
                return jax.lax.fori_loop(0, iters, body, a)

            limb_hmult = timed(limb_hmult_chain, a_rows, b_rows, evk_rows,
                               T_l)

            @jax.jit
            def limb_hrot_chain(a, perm_, rotk, T_, iters):
                def body(_, carry):
                    return _hrotate_limb_body(carry, perm_, rotk, T_,
                                              axis="limb")
                return jax.lax.fori_loop(0, iters, body, a)

            limb_hrot = timed(limb_hrot_chain, a_rows, perm, rot_rows, T_l)

            for op, tc in (("hmult", coeff_hmult), ("hrotate", coeff_hrot)):
                compute_ms.setdefault(f"{op}|coeff|{ns}", {})[lvl] = \
                    round(1e3 * tc, 4)
            for op, tc in (("hmult", limb_hmult), ("hrotate", limb_hrot)):
                compute_ms.setdefault(f"{op}|limb|{ns}", {})[lvl] = \
                    round(1e3 * tc, 4)
            print(f"# ns={ns} level={lvl}: coeff hmult/hrot = "
                  f"{1e3*coeff_hmult:.3f}/{1e3*coeff_hrot:.3f} ms, "
                  f"limb = {1e3*limb_hmult:.3f}/{1e3*limb_hrot:.3f} ms",
                  flush=True)

            # ---- overlappable phase sections (top anchor level only) ----
            if lvl != LEVELS[0]:
                continue
            sa, sm, alpha = T_l.sa, T_l.sm, T_l.alpha
            rng = np.random.default_rng(0)

            def u32(*shape, cap=2**29):
                return jnp.asarray(rng.integers(
                    0, cap, size=shape, dtype=np.uint64).astype(np.uint32))

            n1, n2 = params.ntt.n1, params.ntt.n2
            # (a) modup conversion section: per-chunk fused digit convs
            # over the gathered rows (the compute that overlaps the modup
            # gather's in-flight chunks)
            c_full = u32(ns * sm, n1, n2)

            @jax.jit
            def modup_conv_chain(x, T_, iters):
                def body(_, y):
                    chunks = (jnp.split(y, G, axis=1) if G > 1 else [y])
                    convs = []
                    for dt in T_.digits:
                        cc = [bconv_fused(
                            gp[dt.lo:dt.hi], dt.step1_pl, dt.step1_sh,
                            dt.in_q, dt.mat_bf16, dt.horner_sh, T_.q_ext,
                            interpret=T_.interpret, center=True)
                            for gp in chunks]
                        convs.append(jnp.concatenate(cc, axis=1)
                                     if G > 1 else cc[0])
                    o = jnp.concatenate(convs, axis=0)
                    return y.at[0, 0, 0].add(o[0, 0, 0])
                return jax.lax.fori_loop(0, iters, body, x)

            sec_modup_conv = timed(modup_conv_chain, c_full, T_l,
                                   k1=8, k2=120)

            # (b) d0/d1 tensor-product section (hmult; independent of the
            # modup gather chain)
            q3 = T_l.q_main[:, None, None]
            qi3 = T_l.qinv_main[:, None, None]
            r23 = T_l.r2_main[:, None, None]
            aa = u32(2, sm, n2, n1)
            bb = u32(2, sm, n2, n1)

            @jax.jit
            def d01_chain(a, b, iters):
                def body(_, y):
                    a0m = to_mont(y[0], r23, q3, qi3)
                    a1m = to_mont(y[1], r23, q3, qi3)
                    d0 = mont_mul(b[0], a0m, q3, qi3)
                    d1 = modadd(mont_mul(b[1], a0m, q3, qi3),
                                mont_mul(b[0], a1m, q3, qi3), q3)
                    return y.at[0, 0, 0, 0].add(d0[0, 0, 0] ^ d1[0, 0, 0])
                return jax.lax.fori_loop(0, iters, body, a)

            sec_d01 = timed(d01_chain, aa, bb, k1=8, k2=120)

            # (c) main-row inner product (deferred past the tail gather)
            beta = len(T_l.digits)
            ev = u32(beta * B, n2, n1)

            @jax.jit
            def ip_main_chain(e, evk, T_, iters):
                def body(_, y):
                    m0, m1 = _ip_slice(y, evk, T_, slice(sa, sa + sm))
                    return y.at[0, 0, 0].add(m0[0, 0, 0] ^ m1[0, 0, 0])
                return jax.lax.fori_loop(0, iters, body, e)

            sec_ip_main = timed(ip_main_chain, ev, evk_rows, T_l,
                                k1=8, k2=120)

            # (d) hmult tail conversion section (per-chunk w math + tail
            # bconv, the compute that overlaps the tail gather)
            gf_h = u32(2, ns * (sa + 1), n1, n2)
            idx_sp = np.concatenate([np.arange(i * (sa + 1),
                                               i * (sa + 1) + sa)
                                     for i in range(ns)])
            th = ((T_l.q_sp_full >> 1) + 1)[None, :, None, None]
            q_last = T_l.q_last

            @jax.jit
            def tail_conv_chain(gfull, T_, iters):
                from homulator_tpu.ops.modmath import (
                    lazy_tree_sum, modsub, shoup_mul, shoup_mul_lazy,
                )

                def body(_, y):
                    outs = []
                    for gf in (jnp.split(y, G, axis=2) if G > 1 else [y]):
                        bhat = gf[:, idx_sp][:, :alpha]
                        zl = gf[:, 0 * (sa + 1) + sa]
                        v = jnp.sum((bhat >= th).astype(jnp.uint32),
                                    axis=1, keepdims=True)
                        be = jnp.concatenate([bhat, v], axis=1)
                        terms = shoup_mul_lazy(
                            be, T_.md2l_pl[None, :, None, None],
                            T_.md2l_sh[None, :, None, None], q_last)
                        cl = lazy_tree_sum(terms.swapaxes(0, 1), q_last)
                        w = shoup_mul(modsub(zl, cl, q_last),
                                      T_.pinv_last_pl, T_.pinv_last_sh,
                                      q_last)
                        iw = (w >= ((q_last >> 1) + 1)).astype(jnp.uint32)
                        for k in (0, 1):
                            outs.append(bconv_fused(
                                jnp.concatenate(
                                    [be[k], w[k][None], iw[k][None]],
                                    axis=0),
                                T_.one_tail_pl, T_.one_tail_sh,
                                T_.in_q_tail, T_.tail_bf16, T_.tail_hsh,
                                T_.q_main, interpret=T_.interpret,
                                center=False))
                    o = outs[0]
                    return y.at[0, 0, 0, 0].add(o[0, 0, 0])
                return jax.lax.fori_loop(0, iters, body, gfull)

            sec_tail_h = timed(tail_conv_chain, gf_h, T_l, k1=8, k2=120)

            # (e) hrotate ModDown conversion section
            gf_r = u32(2, ns * sa, n1, n2)

            @jax.jit
            def md_conv_chain(gfull, T_, iters):
                def body(_, y):
                    outs = []
                    for gf in (jnp.split(y, G, axis=2) if G > 1 else [y]):
                        bhat = gf[:, :alpha]
                        for k in (0, 1):
                            outs.append(bconv_fused(
                                bhat[k], T_.one_sp_pl, T_.one_sp_sh,
                                T_.q_sp_full, T_.md_bf16, T_.md_hsh,
                                T_.q_main, interpret=T_.interpret,
                                center=True))
                    o = outs[0]
                    return y.at[0, 0, 0, 0].add(o[0, 0, 0])
                return jax.lax.fori_loop(0, iters, body, gfull)

            sec_md_r = timed(md_conv_chain, gf_r, T_l, k1=8, k2=120)

            f = (G - 1) / G if G > 1 else 0.0
            overlap_ms[f"hmult|{ns}"] = {
                "modup": round(1e3 * (sec_modup_conv * f + sec_d01), 4),
                "tail": round(1e3 * (sec_ip_main + sec_tail_h * f), 4),
                "level": lvl,
                "sections_ms": {
                    "modup_conv": round(1e3 * sec_modup_conv, 4),
                    "d01": round(1e3 * sec_d01, 4),
                    "ip_main": round(1e3 * sec_ip_main, 4),
                    "tail_conv": round(1e3 * sec_tail_h, 4),
                },
            }
            overlap_ms[f"hrotate|{ns}"] = {
                "modup": round(1e3 * sec_modup_conv * f, 4),
                "tail": round(1e3 * (sec_ip_main + sec_md_r * f), 4),
                "level": lvl,
                "sections_ms": {
                    "modup_conv": round(1e3 * sec_modup_conv, 4),
                    "ip_main": round(1e3 * sec_ip_main, 4),
                    "md_conv": round(1e3 * sec_md_r, 4),
                },
            }
            print(f"# ns={ns} overlappable sections (ms): modup_conv="
                  f"{1e3*sec_modup_conv:.3f} d01={1e3*sec_d01:.3f} "
                  f"ip_main={1e3*sec_ip_main:.3f} tail={1e3*sec_tail_h:.3f}"
                  f" md={1e3*sec_md_r:.3f}", flush=True)

    # ---- hybrid 2-D limb x coeff per-shard compute ----------------------
    HYBRIDS = [] if smoke else [(2, 2), (4, 2)]
    for ns_l, ns_c in HYBRIDS:
        _patch_collectives(ns_l, ns_a2a=ns_c)
        cols = params.ntt.n1 // ns_c
        for lvl in LEVELS:
            m = np.zeros(params.n, dtype=np.int64)
            m[0] = int(3 * scale)
            ct1 = eng.encrypt_ints(m, lvl, scale)
            ct2 = eng.encrypt_ints(m, lvl, scale)
            T = build_limb_tables(dc, lvl, ns_l, col_axis="coeff")
            spec = _limb_specs(T, "limb", "coeff")
            T_l = _shard_slice(
                _shard_slice(T, spec, "limb", ns_l), spec, "coeff", ns_c)
            order = evk_limb_row_order(params, lvl, ns_l)
            B = T.sa + T.sm
            evk_rows = jnp.take(eng.relin_key, jnp.asarray(order[:B]),
                                axis=2)[..., :cols]
            rot_rows = jnp.take(eng.rot_keys[1], jnp.asarray(order[:B]),
                                axis=2)[..., :cols]
            a_rows = pad_main_rows(ct1.data, lvl, ns_l)[:, : T.sm, :, :cols]
            b_rows = pad_main_rows(ct2.data, lvl, ns_l)[:, : T.sm, :, :cols]
            g = params.galois_elt(1)
            local_src, pairs, _ = dc.automorph_shard_route(g, ns_c)
            lsrc0 = local_src[0]

            @jax.jit
            def hyb_hmult_chain(a, b, evk, T_, iters):
                def body(_, carry):
                    return _hmult_limb_body(carry, b, evk, T_, axis="limb")
                return jax.lax.fori_loop(0, iters, body, a)

            hyb_hmult = timed(hyb_hmult_chain, a_rows, b_rows, evk_rows,
                              T_l)

            @jax.jit
            def hyb_hrot_chain(a, lsrc, rotk, T_, iters):
                def body(_, carry):
                    return _hrotate_limb_body(
                        carry, lsrc, rotk, T_, axis="limb",
                        col_route=("coeff", pairs))
                return jax.lax.fori_loop(0, iters, body, a)

            hyb_hrot = timed(hyb_hrot_chain, a_rows, lsrc0, rot_rows, T_l)
            compute_ms.setdefault(
                f"hmult|hybrid{ns_l}x{ns_c}|{ns_l * ns_c}", {})[lvl] = \
                round(1e3 * hyb_hmult, 4)
            compute_ms.setdefault(
                f"hrotate|hybrid{ns_l}x{ns_c}|{ns_l * ns_c}", {})[lvl] = \
                round(1e3 * hyb_hrot, 4)
            print(f"# hybrid {ns_l}x{ns_c} level={lvl}: hmult/hrot = "
                  f"{1e3*hyb_hmult:.3f}/{1e3*hyb_hrot:.3f} ms", flush=True)

    # ---- install the measured constants + project ------------------------
    t1_anchors = {
        "hmult": {lvl: round(1e3 * t1[lvl][0], 4) for lvl in LEVELS},
        "hrotate": {lvl: round(1e3 * t1[lvl][1], 4) for lvl in LEVELS},
    }
    measured = {"compute_ms": compute_ms, "overlap_ms": overlap_ms,
                "t1_ms": t1_anchors,
                "meta": {"gchunks": G, "params": out["params"],
                         "measured_at": time.strftime("%Y-%m-%d %H:%M:%S")}}
    dispatch_model.MEASURED = measured

    def dcn_t(params_, op, axis, ns, lvl, bw_dcn):
        """2-host variant of the model: the gather/a2a traffic splits at
        the host boundary; DCN and ICI are distinct fabrics -> comm =
        max(intra/BW_ici, inter/BW_dcn); launches pay DCN latency."""
        anchors = measured["compute_ms"].get(f"{op}|{axis}|{ns}")
        comp = dispatch_model._interp_level(anchors, lvl) / 1e3
        if axis == "limb":
            ici = ici_bytes_per_op_limb(params_, lvl, ns, op)
            colls = limb_collective_count(params_, lvl, ns, op)
            # per-device receive: (ns-1) blocks; ns/2 cross DCN
            inter = ici * (ns // 2) / (ns - 1)
            intra = ici - inter
        else:
            ici = ici_bytes_per_op(params_, lvl, ns, op)
            colls = dispatch_model.coeff_collective_count(params_, lvl, op)
            # a2a: of the (ns-1)/ns received shards, ns/2 cross DCN
            inter = ici * (ns // 2) / (ns - 1)
            intra = ici - inter
        t = comp + max(intra / BW0, inter / bw_dcn) + colls * TCOLL_DCN
        if axis == "limb":
            ov = measured["overlap_ms"].get(f"{op}|{ns}")
            if ov and G > 1:
                # overlap credit against the slower fabric's serial time
                hide = (max(intra / BW0, inter / bw_dcn)) * (G - 1) / G
                t -= min(hide, (ov["modup"] + ov["tail"]) / 1e3)
        return t

    rows = []
    lvl0 = LEVELS[0]
    for ns in NSS:
        for op, t1s in (("hmult", t1[lvl0][0]), ("hrotate", t1[lvl0][1])):
            for axis in ("coeff", "limb"):
                ici = (ici_bytes_per_op_limb(params, lvl0, ns, op)
                       if axis == "limb"
                       else ici_bytes_per_op(params, lvl0, ns, op))
                colls = (limb_collective_count(params, lvl0, ns, op)
                         if axis == "limb"
                         else dispatch_model.coeff_collective_count(
                             params, lvl0, op))
                r = {"op": op, "axis": axis, "ns": ns,
                     "compute_ms": compute_ms[f"{op}|{axis}|{ns}"][lvl0],
                     "compute_ms_by_level":
                         compute_ms[f"{op}|{axis}|{ns}"],
                     "ici_mb": round(ici / 1e6, 2), "collectives": colls}
                for bw in BW_GRID:
                    for tl in TCOLL_GRID:
                        t_total = dispatch_model.predict_ms(
                            params, op, axis, ns, lvl0, bw=bw, tcoll=tl)
                        key = f"bw{bw/1e9:g}_tl{tl*1e6:g}us"
                        r[f"t_ms[{key}]"] = round(t_total, 4)
                        r[f"eff[{key}]"] = round(
                            1e3 * t1s / (ns * t_total), 4)
                t0 = dispatch_model.predict_ms(params, op, axis, ns, lvl0)
                t0_no = dispatch_model.predict_ms(
                    params, op, axis, ns, lvl0, overlap=False)
                r["t_ms"] = round(t0, 4)
                r["t_ms_no_overlap"] = round(t0_no, 4)
                r["overlap_credit_ms"] = round(t0_no - t0, 4)
                r["ops_per_s"] = round(1e3 / t0, 1)
                r["efficiency"] = round(1e3 * t1s / (ns * t0), 4)
                r["efficiency_no_overlap"] = round(
                    1e3 * t1s / (ns * t0_no), 4)
                # 2-host rows (mesh split across the DCN boundary)
                if ns >= 4:
                    for bwd in BW_DCN_GRID:
                        td = dcn_t(params, op, axis, ns, lvl0, bwd)
                        key = f"2host_bwdcn{bwd/1e9:g}"
                        r[f"t_ms[{key}]"] = round(1e3 * td, 4)
                        r[f"eff[{key}]"] = round(t1s / (ns * td), 4)
                    td0 = dcn_t(params, op, axis, ns, lvl0, BW_DCN0)
                    r["t_ms_2host"] = round(1e3 * td0, 4)
                    r["efficiency_2host"] = round(t1s / (ns * td0), 4)
                rows.append(r)
                print(f"ns={ns} {op:8} {axis:5} "
                      f"compute={r['compute_ms']:7.3f} ms "
                      f"ici={ici/1e6:6.2f} MB colls={colls:3} -> "
                      f"T={r['t_ms']:7.3f} ms (no-ov {r['t_ms_no_overlap']:7.3f}) "
                      f"eff={r['efficiency']:.2%} "
                      f"(no-ov {r['efficiency_no_overlap']:.2%})",
                      flush=True)

    # hybrid rows from the shared model (measured hybrid anchors)
    hyb_rows = []
    for ns_l, ns_c in HYBRIDS:
        for op, t1s in (("hmult", t1[lvl0][0]), ("hrotate", t1[lvl0][1])):
            th = dispatch_model.predict_hybrid_ms(
                params, op, ns_l, ns_c, lvl0)
            if th is None:
                continue
            hyb_rows.append({
                "op": op, "axis": f"hybrid_{ns_l}limb_x_{ns_c}coeff",
                "ns": ns_l * ns_c, "ns_l": ns_l, "ns_c": ns_c,
                "compute_ms": compute_ms[
                    f"{op}|hybrid{ns_l}x{ns_c}|{ns_l * ns_c}"][lvl0],
                "t_ms": round(th, 4),
                "efficiency": round(1e3 * t1s / (ns_l * ns_c * th), 4),
            })
            print(f"hybrid {ns_l}x{ns_c} {op:8} T={th:7.3f} ms "
                  f"eff={1e3 * t1s / (ns_l * ns_c * th):.2%}", flush=True)
    out["rows"] = rows
    out["hybrid_rows_measured"] = hyb_rows
    out["overlap_sections"] = overlap_ms
    out["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    if smoke:
        print("# smoke OK (no artifact written)")
        return 0
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    gen = os.path.join(ROOT, "homulator_tpu", "parallel",
                       "_scaling_measured.py")
    with open(gen, "w") as f:
        f.write(
            '"""GENERATED by scripts/scaling_projection.py — measured\n'
            "per-shard compute anchors + overlappable-section times for\n"
            'the dispatch model (parallel/dispatch_model.py). Do not edit\n'
            'by hand; re-run the script on the TPU to refresh."""\n\n'
            f"MEASURED = {measured!r}\n")
    print("# wrote SCALING.json + parallel/_scaling_measured.py")
    return 0


if __name__ == "__main__":
    sys.exit(main())
