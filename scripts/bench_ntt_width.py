#!/usr/bin/env python
"""Why is per-shard (coeff-sharded) compute flat in column width?

SCALING.json shows the coeff dispatch's per-device compute barely drops
as columns shrink (0.95 -> 0.86 ms from ns=1 to 8) while the limb path's
scales 4.9x. This microbench isolates WHERE the width-independence lives:
the phase-split NTT kernel halves (ntt_phase1/2, the per-shard compute
unit of the coeff path) and the fused bconv kernel, each timed at widths
c = 256/128/64/32 (ns = 1/2/4/8) at set-B row counts.

Writes WIDTH_SCALING.json; run on the TPU.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from homulator_tpu import benchlib
    from homulator_tpu.api import CkksEngine
    from homulator_tpu.ops.bconv_fused import bconv_fused
    from homulator_tpu.ops.ntt_pallas import (
        intt_phase1_pallas, intt_phase2_pallas, ntt_phase1_pallas,
        ntt_phase2_pallas,
    )
    from homulator_tpu.params import get_params

    params = get_params(n=2**16, max_level=45, alpha=15)
    eng = CkksEngine(params, seed=1)
    level = 35
    nb = eng.dc.ntt_basis(eng.dc.main_rows(level))
    p1, p1s, mid, mids, p2, p2s = nb.pfwd
    ip1, ip1s, midi, midis, ip2, ip2s = nb.pinv
    kt = eng.dc.keyswitch_tables(level)
    dt = kt.digits[0]
    nd = dt.hi - dt.lo
    n1, n2 = nb.n1, nb.n2
    rng = np.random.default_rng(0)

    out = {"rows": level, "n1": n1, "n2": n2}
    results = []
    for ns in (1, 2, 4, 8):
        c = n2 // ns
        x = jnp.asarray(rng.integers(
            0, 2**30, size=(level, n1, c), dtype=np.uint64
        ).astype(np.uint32))
        midc = mid[:, :, :c]
        midsc = mids[:, :, :c]

        @jax.jit
        def p1_chain(v, iters):
            def body(_, y):
                return ntt_phase1_pallas(
                    y, nb.q, p1, p1s, midc, midsc, n1=n1, c=c,
                    interpret=False,
                )[:, :n1, :c]
            return jax.lax.fori_loop(0, iters, body, v)

        y0 = jnp.asarray(rng.integers(
            0, 2**30, size=(level, n2, n1 // ns), dtype=np.uint64
        ).astype(np.uint32))

        @jax.jit
        def p2_chain(v, iters):
            def body(_, y):
                return ntt_phase2_pallas(
                    y, nb.q, p2, p2s, n2=n2, c=n1 // ns, interpret=False,
                )
            return jax.lax.fori_loop(0, iters, body, v)

        xb = jnp.asarray(rng.integers(
            0, 2**30, size=(nd, n1, c), dtype=np.uint64
        ).astype(np.uint32))

        @jax.jit
        def bc_chain(v, iters):
            def body(_, y):
                o = bconv_fused(
                    y, dt.step1_pl, dt.step1_sh,
                    kt.main_nt.q[dt.lo:dt.hi], dt.mat_bf16,
                    dt.horner_sh, dt.other_nt.q, center=True,
                )
                return o[:nd]
            return jax.lax.fori_loop(0, iters, body, v)

        t_p1 = benchlib.time_chained(p1_chain, 8, 400, x)
        t_p2 = benchlib.time_chained(p2_chain, 8, 400, y0)
        t_bc = benchlib.time_chained(bc_chain, 8, 800, xb)
        r = {"ns": ns, "c": c,
             "phase1_us_per_row": round(1e6 * t_p1 / level, 3),
             "phase2_us_per_row": round(1e6 * t_p2 / level, 3),
             "bconv_digit_us": round(1e6 * t_bc, 2)}
        results.append(r)
        print(r, flush=True)
    # ---- lane-packed kernels at narrow widths (the identified lever):
    # k = 128/c limbs side-by-side -> every instruction full-width.
    from homulator_tpu.ops.ntt_pallas import (
        ntt_phase1_packed_pallas, ntt_phase2_packed_pallas,
        pack_limb_lanes, pack_phase_tables,
    )

    Mp = 32  # divisible by k = 2 and 4
    for ns in (4, 8):
        c = n2 // ns
        k = 128 // c
        qN = np.asarray(nb.q)[:Mp]
        qrow, p1p, p1sp, midp, midsp = pack_phase_tables(
            qN, np.asarray(p1)[:Mp], np.asarray(p1s)[:Mp],
            np.asarray(mid)[:Mp], np.asarray(mids)[:Mp], k, c)
        _, p2p, p2sp, _, _ = pack_phase_tables(
            qN, np.asarray(p2)[:Mp], np.asarray(p2s)[:Mp],
            np.asarray(mid)[:Mp], np.asarray(mids)[:Mp], k, n1 // ns)
        xp = pack_limb_lanes(jnp.asarray(rng.integers(
            0, 2**30, size=(Mp, n1, c), dtype=np.uint64
        ).astype(np.uint32)), k)
        yp = pack_limb_lanes(jnp.asarray(rng.integers(
            0, 2**30, size=(Mp, n2, n1 // ns), dtype=np.uint64
        ).astype(np.uint32)), k)

        @jax.jit
        def pp1_chain(v, iters):
            def body(_, y):
                return ntt_phase1_packed_pallas(
                    y, qrow, p1p, p1sp, midp, midsp, n1=n1,
                    interpret=False)
            return jax.lax.fori_loop(0, iters, body, v)

        @jax.jit
        def pp2_chain(v, iters):
            def body(_, y):
                return ntt_phase2_packed_pallas(
                    y, qrow, p2p, p2sp, n2=n2, interpret=False)
            return jax.lax.fori_loop(0, iters, body, v)

        t1 = benchlib.time_chained(pp1_chain, 8, 400, xp)
        t2 = benchlib.time_chained(pp2_chain, 8, 400, yp)
        r = {"ns": ns, "c": c, "packed_k": k,
             "packed_phase1_us_per_row": round(1e6 * t1 / Mp, 3),
             "packed_phase2_us_per_row": round(1e6 * t2 / Mp, 3)}
        results.append(r)
        print(r, flush=True)

    # width-scaling factors vs full width
    f0 = results[0]
    for r in results:
        if "phase1_us_per_row" not in r:
            continue
        r["phase1_vs_full"] = round(
            r["phase1_us_per_row"] / f0["phase1_us_per_row"], 3)
        r["phase2_vs_full"] = round(
            r["phase2_us_per_row"] / f0["phase2_us_per_row"], 3)
        r["bconv_vs_full"] = round(
            r["bconv_digit_us"] / f0["bconv_digit_us"], 3)
    out["results"] = results
    with open(os.path.join(ROOT, "WIDTH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("# wrote WIDTH_SCALING.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
