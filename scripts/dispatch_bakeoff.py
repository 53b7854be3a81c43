#!/usr/bin/env python
"""Dispatch bake-off: exact per-device ICI volume of the two explicit-
collective shard_map paths, per (op, level, mesh size).

The reference's primary parallel axis is the RNS limb (Driver.h:155-191,
`ins->limb % cluster`); the repo also has a coefficient-axis path (the
sequence-parallel analog, parallel/sharded.py). Both ICI formulas are
EXACT counts of the collective schedule, each pinned to its lowered HLO by
tests/test_sharding.py (test_ici_bytes_reconcile_with_hlo /
test_limb_ici_bytes_reconcile_with_hlo), so this table is arithmetic over
verified counters — no device needed. The CLI's auto dispatch picks by the
projected-time model (parallel/dispatch_model.py) built from these
counters + measured per-shard compute; this table carries both.

Writes DISPATCH_BAKEOFF.json and prints a table. Set B params (N=2^16,
maxLevel=45, alpha=15), levels {35, 22, 11} x ns {2, 4, 8} per the
round-3 verdict ask.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homulator_tpu.params import get_params  # noqa: E402
from homulator_tpu.parallel.dispatch_model import (  # noqa: E402
    coeff_collective_count, predict_hybrid_ms, predict_ms,
)
from homulator_tpu.parallel.limb_sharded import (  # noqa: E402
    ici_bytes_per_op_limb, limb_collective_count,
)
from homulator_tpu.parallel.sharded import ici_bytes_per_op  # noqa: E402


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
                # chosen = the projected-time model when measurement
                # anchors exist (parallel/dispatch_model.py — the same
                # rule the CLI auto dispatch applies), else ICI volume.
                t_l = predict_ms(params, op, "limb", ns, level)
                t_c = predict_ms(params, op, "coeff", ns, level)
                t_h = (predict_hybrid_ms(params, op, ns // 2, 2, level)
                       if ns >= 4 else None)
                if t_l is not None and t_c is not None:
                    cands = [("limb", t_l), ("coeff", t_c)]
                    if t_h is not None:
                        cands.append((f"hybrid{ns // 2}x2", t_h))
                    chosen = min(cands, key=lambda kv: kv[1])[0]
                else:
                    chosen = "limb" if limb <= coeff else "coeff"
                rows.append({
                    "op": op, "level": level, "ns": ns,
                    "ici_limb_mb": round(limb / 1e6, 3),
                    "ici_coeff_mb": round(coeff / 1e6, 3),
                    "coeff_over_limb": round(coeff / limb, 2),
                    "collectives_limb": limb_collective_count(
                        params, level, ns, op),
                    "collectives_coeff": coeff_collective_count(
                        params, level, op),
                    "t_model_limb_ms": t_l and round(t_l, 4),
                    "t_model_coeff_ms": t_c and round(t_c, 4),
                    "t_model_hybrid_ms": t_h and round(t_h, 4),
                    "chosen": chosen,
                    "chosen_by": ("model" if t_l is not None
                                  and t_c is not None else "volume"),
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
