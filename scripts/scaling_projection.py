#!/usr/bin/env python
"""Multi-chip scaling projection from single-chip measurements.

Real multi-chip hardware is not attached here (one tunneled v5e chip), but
every input of a scaling projection IS measurable or known:

  per-device COMPUTE  — measured ON CHIP by running the actual shard_map
                        body code as a plain jitted program at device-0's
                        exact per-shard shapes, with each collective
                        replaced by a shape-preserving local stand-in
                        (all_gather -> tile, the NTT inter-transpose
                        all_to_all -> local transpose+pad). Same kernels,
                        same Mosaic compilation, same tile widths the real
                        mesh would run — this is also the first time the
                        phase-split NTT kernels meet Mosaic at narrow
                        per-shard tiles (r3 weak #2).
  per-device ICI      — exact byte counts (ici_bytes_per_op[_limb]),
                        HLO-reconciled by tests/test_sharding.py.
  link rate / latency — v5e constants, swept as a sensitivity grid (the
                        one genuinely unmeasurable input from here).

Model per mesh size ns and dispatch axis:

  T(ns) = T_compute(ns) + ICI_bytes(ns) / BW + n_collectives(ns) * t_coll

assuming no compute/communication overlap (conservative; XLA overlaps
some, the reference's NoC model overlaps most). Efficiency =
T(1) / (ns * T(ns)) against BASELINE.md's >= 70 % north-star and the
reference's own measured cluster scaling (BASELINE.md:54-66, 98 % at 8).

Writes SCALING.json. Run on the TPU (several minutes; compiles ~16 new
programs through the remote endpoint on first run).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

LEVEL = 35
NSS = (2, 4, 8)
# v5e ICI: 4 links/chip, ~186 GB/s aggregate injection per chip (public
# spec 1600 Gbps). Effective per-device receive bandwidth for the
# gather/transpose patterns here is well below peak; 45 GB/s is the
# conservative center, swept 2x each way.
BW_GRID = (22.5e9, 45e9, 90e9)
TCOLL_GRID = (2e-6, 5e-6, 20e-6)
BW0, TCOLL0 = BW_GRID[1], TCOLL_GRID[1]


def _patch_collectives(ns):
    """Replace the collectives the shard bodies call with shape-preserving
    single-chip stand-ins (values become meaningless; compute shapes and
    kernel launches stay exactly per-shard). Bench-process-only patching."""
    import jax
    import jax.numpy as jnp

    import homulator_tpu.ops.ntt as ntt_mod

    def fake_all_gather(x, axis_name, *, axis=0, tiled=True):
        reps = [1] * x.ndim
        reps[axis] = ns
        return jnp.tile(x, reps)

    def fake_axis_index(axis_name):
        return jnp.uint32(0)

    def fake_transpose_a2a(y, axis):
        # real: local [M, a, b/ns] -> local slice [M, b, a/ns] of the
        # global transpose. Stand-in with identical shapes and a
        # comparable local data movement cost.
        M, a, bl = y.shape
        z = jnp.swapaxes(y, 1, 2)  # [M, b/ns, a]
        z = jnp.tile(z, (1, ns, 1))
        return z[:, :, : a // ns]

    jax.lax.all_gather = fake_all_gather
    jax.lax.axis_index = fake_axis_index
    ntt_mod._transpose_a2a = fake_transpose_a2a


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
    global LEVEL, NSS
    smoke = "--smoke" in sys.argv  # CPU harness check: tiny params,
    # interpret-mode kernels, one mesh size, no artifact write
    if smoke:
        LEVEL = 8
        NSS = (4,)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from homulator_tpu import benchlib
    from homulator_tpu.api import CkksEngine
    from homulator_tpu.params import get_params
    from homulator_tpu.parallel.limb_sharded import (
        _hmult_limb_body, _hrotate_limb_body, _limb_specs, build_limb_tables,
        evk_limb_row_order, ici_bytes_per_op_limb, pad_main_rows,
    )
    from homulator_tpu.parallel.sharded import (
        _hrotate_body, _keyswitch_specs, _ntt_basis_specs, ici_bytes_per_op,
    )
    from homulator_tpu.api import hmult_graph
    from jax.sharding import PartitionSpec as P

    from scripts.dispatch_bakeoff import coeff_collective_count

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
    m = np.zeros(params.n, dtype=np.int64)
    m[0] = int(3 * scale)
    ct1 = eng.encrypt_ints(m, LEVEL, scale)
    ct2 = eng.encrypt_ints(m, LEVEL, scale)

    def timed(fn, *args):
        """Chained-loop seconds/iter; in smoke mode just execute once
        (harness/compile check, not a measurement)."""
        if smoke:
            np.asarray(jax.device_get(fn(*args, 1).ravel()[:8]))
            return 1.0
        return benchlib.time_chained(fn, 4, 28, *args)

    out = {"level": LEVEL, "params": {"n": 2**16, "max_level": 45,
                                      "alpha": 15},
           "bw_grid_GBps": [b / 1e9 for b in BW_GRID],
           "tcoll_grid_us": [t * 1e6 for t in TCOLL_GRID],
           "model": "T(ns)=T_compute(ns) + ICI/BW + colls*t_coll "
                    "(no overlap assumed)"}

    # ---- ns = 1 baselines (the ordinary single-chip graphs) -------------
    if smoke:
        t1_hmult = t1_hrot = 1.0
    else:
        t1_hmult = benchlib.hmult_seconds(eng, ct1, ct2)
        t1_hrot = benchlib.hrotate_seconds(eng, ct1, step=1)
    out["t1_hmult_ms"] = round(1e3 * t1_hmult, 4)
    out["t1_hrotate_ms"] = round(1e3 * t1_hrot, 4)
    print(f"# single-chip: hmult {1e3*t1_hmult:.3f} ms, "
          f"hrotate {1e3*t1_hrot:.3f} ms", flush=True)

    rows = []
    for ns in NSS:
        _patch_collectives(ns)  # re-patched per ns (stand-ins close over ns)
        c = params.ntt.n1 // ns

        # ---- coeff axis: per-shard compute (device-0 column slices) -----
        AX = "x"
        kt = dc.keyswitch_tables(LEVEL, shard_axis=AX)
        kt_l = _shard_slice(kt, _keyswitch_specs(kt, AX), AX, ns)
        lnt = dc.ntt_basis((LEVEL - 1,), shard_axis=AX)
        lnt_l = _shard_slice(lnt, _ntt_basis_specs(lnt, AX), AX, ns)
        ont = dc.ntt_basis(dc.main_rows(LEVEL - 1), shard_axis=AX)
        ont_l = _shard_slice(ont, _ntt_basis_specs(ont, AX), AX, ns)
        rs = dc.rescale_qinv_mont(LEVEL)
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

        # ---- limb axis: per-shard compute (device-0 row blocks) ---------
        T = build_limb_tables(dc, LEVEL, ns)
        T_l = _shard_slice(T, _limb_specs(T, "limb"), "limb", ns)
        order = evk_limb_row_order(params, LEVEL, ns)
        B = T.sa + T.sm
        evk_rows = jnp.take(eng.relin_key, jnp.asarray(order[:B]), axis=2)
        rot_rows = jnp.take(eng.rot_keys[1], jnp.asarray(order[:B]), axis=2)
        a_rows = pad_main_rows(ct1.data, LEVEL, ns)[:, : T.sm]
        b_rows = pad_main_rows(ct2.data, LEVEL, ns)[:, : T.sm]
        perm = dc.automorph_perm(g)

        @jax.jit
        def limb_hmult_chain(a, b, evk, T_, iters):
            def body(_, carry):
                return _hmult_limb_body(carry, b, evk, T_, axis="limb")
            return jax.lax.fori_loop(0, iters, body, a)

        limb_hmult = timed(limb_hmult_chain, a_rows, b_rows, evk_rows, T_l)

        @jax.jit
        def limb_hrot_chain(a, perm_, rotk, T_, iters):
            def body(_, carry):
                return _hrotate_limb_body(carry, perm_, rotk, T_,
                                          axis="limb")
            return jax.lax.fori_loop(0, iters, body, a)

        limb_hrot = timed(limb_hrot_chain, a_rows, perm, rot_rows, T_l)

        for op, t1, tc_coeff, tc_limb in (
            ("hmult", t1_hmult, coeff_hmult, limb_hmult),
            ("hrotate", t1_hrot, coeff_hrot, limb_hrot),
        ):
            for axis_name, tc in (("coeff", tc_coeff), ("limb", tc_limb)):
                if axis_name == "coeff":
                    ici = ici_bytes_per_op(params, LEVEL, ns, op)
                    colls = coeff_collective_count(params, LEVEL, op)
                else:
                    ici = ici_bytes_per_op_limb(params, LEVEL, ns, op)
                    colls = 3 if op == "hmult" else 2
                r = {"op": op, "axis": axis_name, "ns": ns,
                     "compute_ms": round(1e3 * tc, 4),
                     "ici_mb": round(ici / 1e6, 2), "collectives": colls}
                for bw in BW_GRID:
                    for tl in TCOLL_GRID:
                        t_total = tc + ici / bw + colls * tl
                        key = f"bw{bw/1e9:g}_tl{tl*1e6:g}us"
                        r[f"t_ms[{key}]"] = round(1e3 * t_total, 4)
                        r[f"eff[{key}]"] = round(t1 / (ns * t_total), 4)
                t0 = tc + ici / BW0 + colls * TCOLL0
                r["t_ms"] = round(1e3 * t0, 4)
                r["ops_per_s"] = round(1.0 / t0, 1)
                r["efficiency"] = round(t1 / (ns * t0), 4)
                rows.append(r)
                print(f"ns={ns} {op:8} {axis_name:5} compute={1e3*tc:7.3f} "
                      f"ms ici={ici/1e6:6.2f} MB colls={colls:3} -> "
                      f"T={1e3*t0:7.3f} ms eff={r['efficiency']:.2%}",
                      flush=True)

    out["rows"] = rows
    out["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    if smoke:
        print("# smoke OK (no artifact written)")
        return 0
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("# wrote SCALING.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
