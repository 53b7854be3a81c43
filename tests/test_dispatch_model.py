"""Dispatch-model tests: level interpolation, model/volume routing, and
the limb collective-count pinned to the lowered HLO."""

import numpy as np
import pytest

from homulator_tpu.params import get_params
from homulator_tpu.parallel import dispatch_model


def test_interp_level():
    f = dispatch_model._interp_level
    assert f({35: 1.0, 11: 0.5}, 35) == 1.0
    assert f({35: 1.0, 11: 0.5}, 11) == 0.5
    assert abs(f({11: 0.5, 35: 1.0}, 23) - 0.75) < 1e-12
    # extrapolation continues the outer segment
    assert abs(f({11: 0.5, 35: 1.0}, 43) - (1.0 + 8 / 24 * 0.5)) < 1e-12
    # single anchor -> proportional
    assert abs(f({35: 1.4}, 17.5) - 0.7) < 1e-12
    assert f({}, 10) is None


def test_choose_axis_volume_fallback(monkeypatch):
    """Without measurement anchors the rule falls back to ICI volume."""
    monkeypatch.setattr(dispatch_model, "MEASURED", None)
    params = get_params(n=256, max_level=8, alpha=4)
    axis, t_l, t_c, how = dispatch_model.choose_axis(params, "hmult", 2, 4)
    assert how == "volume" and t_l is None
    # hrotate: limb wins at the tiny shape (zero-ICI automorphism)
    axis_r, _, _, _ = dispatch_model.choose_axis(params, "hrotate", 2, 4)
    assert axis_r == "limb"


def test_choose_axis_model(monkeypatch):
    """With anchors the model ranks by projected T, not volume."""
    params = get_params(n=256, max_level=8, alpha=4)
    fake = {
        "compute_ms": {
            "hmult|limb|4": {8: 0.1},
            "hmult|coeff|4": {8: 10.0},  # volume would prefer coeff here
        },
        "overlap_ms": {},
    }
    monkeypatch.setattr(dispatch_model, "MEASURED", fake)
    axis, t_l, t_c, how = dispatch_model.choose_axis(params, "hmult", 4, 8)
    assert how == "model" and axis == "limb" and t_l < t_c


def test_measured_anchors_route_set_b():
    """When the generated measurement module is present (committed by the
    projection run), auto dispatch at set B must pick the measured-faster
    axis — limb for hmult at ns=4 (VERDICT r4 weak #1)."""
    if dispatch_model.MEASURED is None:
        pytest.skip("no _scaling_measured.py generated yet")
    params = get_params(n=2**16, max_level=45, alpha=15)
    axis, t_l, t_c, how = dispatch_model.choose_axis(
        params, "hmult", 4, 35)
    assert how == "model"
    assert axis == "limb", (t_l, t_c)


def test_limb_collective_count_matches_hlo():
    """limb_collective_count == number of all_gathers in the lowered
    limb-sharded programs (chunked gathers: 2 sites x G chunks)."""
    import re

    import jax.numpy as jnp

    from homulator_tpu.api import CkksEngine
    from homulator_tpu.parallel.limb_sharded import (
        evk_limb_row_order, limb_collective_count, make_limb_hmult,
        pad_main_rows,
    )
    from homulator_tpu.parallel.mesh import make_mesh

    params = get_params(n=256, max_level=8, alpha=4)
    eng = CkksEngine(params, seed=5, ntt_mode="interpret")
    eng.keygen()
    level, ns = 8, 4
    mesh = make_mesh(shape=(ns,), n_devices=ns, axis_names=("limb",))
    rng = np.random.default_rng(3)
    m = np.zeros(params.n, dtype=np.int64)
    m[0] = 77
    ct = eng.encrypt_ints(m, level, 2.0**29)
    a_p = pad_main_rows(ct.data, level, ns)
    order = evk_limb_row_order(params, level, ns)
    evk_l = jnp.take(eng.relin_key, jnp.asarray(order), axis=2)
    lowered = make_limb_hmult(eng.dc, level, mesh).lower(a_p, a_p, evk_l)
    n_gathers = len(re.findall(r"stablehlo\.all_gather",
                               lowered.as_text()))
    assert n_gathers == limb_collective_count(params, level, ns, "hmult")
