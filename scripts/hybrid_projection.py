#!/usr/bin/env python
"""Hybrid limb x coeff 2-D mesh arithmetic (VERDICT r4 missing #3).

The reference composes its two dispatch dimensions — limb % cluster for
transforms AND 2-D (batch x limb) MAC-grid tiling for BCONV/IP
(include/Driver.h:209-285). The repo's explicit meshes are 1-D per axis;
this script does the arithmetic for 2-D (ns_l limb rows x ns_c coeff
columns) compositions from the MEASURED 1-D tables before any build:

  T_comp(ns_l, ns_c) ~ T_comp_limb(ns_l) * colratio(ns_c)
      colratio(ns_c) = measured coeff-axis compute ratio
      compute(coeff, ns_c) / T1 — the measured cost of running the same
      per-row kernel work on 1/ns_c of the columns (NOT 1/ns_c: the
      butterfly kernels do not scale linearly in width, which is exactly
      the coeff path's measured flatness).
  ICI(ns_l, ns_c) = bytes_limb(ns_l)/ns_c            (row gathers carry
                    column slices)
                  + bytes_coeff(ns_c)/ns_l           (transforms run on
                    this device's row block only)
  colls = limb gather chunks + coeff per-transform launches
  H = the limb overlap credit, bounded by the column-scaled overlappable
      sections.

All inputs are measured (compute anchors, overlap sections) or exact
(ICI formulas); the composition itself is the estimate — stated as such.
Appends hybrid_rows to SCALING.json and prints the ranking vs the 1-D
axes. Pure arithmetic; no devices needed.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from homulator_tpu.params import get_params  # noqa: E402
from homulator_tpu.parallel import dispatch_model  # noqa: E402
from homulator_tpu.parallel.dispatch_model import (  # noqa: E402
    BW0, TCOLL0, coeff_collective_count,
)
from homulator_tpu.parallel.limb_sharded import (  # noqa: E402
    ici_bytes_per_op_limb, limb_collective_count,
)
from homulator_tpu.parallel.sharded import ici_bytes_per_op  # noqa: E402

LEVEL = 35


def hybrid_t_ms(params, op, ns_l, ns_c, level, meas):
    """One hybrid row from the SHARED model (dispatch_model.
    predict_hybrid_ms — measured hybrid anchors when available, the
    composition estimate otherwise; same numbers the CLI routes by),
    plus the decomposition detail this table exists to show."""
    t1_ms = meas["t1_ms"][op]
    hkey = f"{op}|hybrid{ns_l}x{ns_c}|{ns_l * ns_c}"
    measured_anchor = hkey in meas["compute_ms"]
    if measured_anchor:
        comp = dispatch_model._interp_level(meas["compute_ms"][hkey], level)
        note = "measured on chip (per-shard body)"
    else:
        comp_l = dispatch_model._interp_level(
            meas["compute_ms"][f"{op}|limb|{ns_l}"], level)
        ratio = min(1.0, dispatch_model._interp_level(
            meas["compute_ms"][f"{op}|coeff|{ns_c}"], level) / t1_ms)
        comp = comp_l * ratio
        note = (f"estimate: limb({ns_l})={comp_l:.3f} x "
                f"colratio({ns_c})={ratio:.3f}")
    ici_l = ici_bytes_per_op_limb(params, level, ns_l, op) / ns_c
    ici_c = ici_bytes_per_op(params, level, ns_c, op) / ns_l
    colls = (limb_collective_count(params, level, ns_l, op)
             + coeff_collective_count(params, level, op))
    t = dispatch_model.predict_hybrid_ms(params, op, ns_l, ns_c, level)
    t_no_ov = comp + 1e3 * ((ici_l + ici_c) / BW0 + colls * TCOLL0)
    return {
        "op": op, "axis": f"hybrid_{ns_l}limb_x_{ns_c}coeff",
        "ns": ns_l * ns_c, "ns_l": ns_l, "ns_c": ns_c,
        "compute_ms": round(comp, 4),
        "compute_note": note,
        "ici_mb": round((ici_l + ici_c) / 1e6, 2),
        "ici_limb_mb": round(ici_l / 1e6, 2),
        "ici_coeff_mb": round(ici_c / 1e6, 2),
        "collectives": colls,
        "overlap_credit_ms": round(t_no_ov - t, 4),
        "t_ms": round(t, 4),
        "efficiency": round(t1_ms / (ns_l * ns_c * t), 4),
    }


def main() -> int:
    if dispatch_model.MEASURED is None:
        print("no _scaling_measured.py — run scripts/scaling_projection.py"
              " first", file=sys.stderr)
        return 1
    meas = dict(dispatch_model.MEASURED)
    params = get_params(n=2**16, max_level=45, alpha=15)
    with open(os.path.join(ROOT, "SCALING.json")) as f:
        scaling = json.load(f)
    meas["t1_ms"] = {"hmult": scaling["t1_hmult_ms"],
                     "hrotate": scaling["t1_hrotate_ms"]}

    combos = [(2, 2), (4, 2), (2, 4)]
    rows = []
    for op in ("hmult", "hrotate"):
        for ns_l, ns_c in combos:
            rows.append(hybrid_t_ms(params, op, ns_l, ns_c, LEVEL, meas))
    # 1-D comparators at the same total ns
    print(f"{'op':8} {'shape':22} {'comp':>7} {'ici':>7} {'T(ms)':>7} "
          f"{'eff':>7}")
    for op in ("hmult", "hrotate"):
        for ns in (4, 8):
            for axis in ("limb", "coeff"):
                t = dispatch_model.predict_ms(params, op, axis, ns, LEVEL)
                t1 = meas["t1_ms"][op]
                print(f"{op:8} 1-D {axis:5} ns={ns:<2}        "
                      f"{'':>7} {'':>7} {t:7.3f} "
                      f"{t1 / (ns * t):7.2%}")
        for r in rows:
            if r["op"] != op:
                continue
            print(f"{op:8} {r['axis']:22} {r['compute_ms']:7.3f} "
                  f"{r['ici_mb']:7.2f} {r['t_ms']:7.3f} "
                  f"{r['efficiency']:7.2%}")
    # ---- 2-host rows: which hybrid axis should cross the DCN ------------
    # A 2-D mesh gives a CHOICE the 1-D axes lack: put the low-volume
    # 2-way coeff axis across the host boundary and the high-volume limb
    # gathers stay entirely on intra-host ICI — collectives crossing DCN
    # pay (BW_dcn, t_coll_dcn), the rest ICI constants. Uses the same
    # distinct-fabric model as scaling_projection's 2-host rows.
    from scripts.scaling_projection import BW_DCN0, TCOLL_DCN
    for r in rows:
        op, ns_l, ns_c = r["op"], r["ns_l"], r["ns_c"]
        if ns_c != 2:
            continue
        comp = r["compute_ms"] / 1e3
        ici_l = r["ici_limb_mb"] * 1e6
        ici_c = r["ici_coeff_mb"] * 1e6
        colls_l = limb_collective_count(params, LEVEL, ns_l, op)
        colls_c = coeff_collective_count(params, LEVEL, op)
        h = r["overlap_credit_ms"] / 1e3
        t1 = meas["t1_ms"][op] / 1e3
        # coeff axis across DCN: limb gathers intra-host on ICI
        t_c_dcn = (comp + max(ici_l / BW0, ici_c / BW_DCN0)
                   + colls_l * TCOLL0 + colls_c * TCOLL_DCN - h)
        # limb axis across DCN (the bad split, for contrast): the limb
        # gathers' ns_l/2-of-(ns_l-1) blocks cross hosts
        inter_l = ici_l * (ns_l // 2) / max(ns_l - 1, 1)
        t_l_dcn = (comp + max((ici_l - inter_l) / BW0 + ici_c / BW0,
                              inter_l / BW_DCN0)
                   + colls_l * TCOLL_DCN + colls_c * TCOLL0 - h)
        r["t_ms_2host_coeff_dcn"] = round(1e3 * t_c_dcn, 4)
        r["eff_2host_coeff_dcn"] = round(
            t1 / (ns_l * ns_c * t_c_dcn), 4)
        r["t_ms_2host_limb_dcn"] = round(1e3 * t_l_dcn, 4)
        r["eff_2host_limb_dcn"] = round(
            t1 / (ns_l * ns_c * t_l_dcn), 4)
        print(f"2host {op:8} {r['axis']:22} coeff-over-DCN "
              f"T={1e3*t_c_dcn:7.3f} ms eff={r['eff_2host_coeff_dcn']:.2%}"
              f" | limb-over-DCN T={1e3*t_l_dcn:7.3f} "
              f"eff={r['eff_2host_limb_dcn']:.2%}")

    scaling["hybrid_rows"] = rows
    scaling["hybrid_note"] = (
        "analytic composition of measured 1-D tables (compute = "
        "limb(ns_l) x measured column ratio; ICI exact per axis); the "
        "reference's 2-D analog is Driver.h:209-285. 2-host columns: "
        "DCN constants (12.5 GB/s, 25 us) on whichever mesh axis "
        "crosses hosts — putting the 2-way coeff axis on DCN keeps the "
        "limb gathers intra-host")
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(scaling, f, indent=1)
    print("# appended hybrid_rows to SCALING.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
