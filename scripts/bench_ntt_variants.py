#!/usr/bin/env python
"""NTT kernel anatomy: time each component of the 4-step kernel separately
to locate the gap between the measured ~4.2 us/transform and the ~2.5 us
pure-op estimate.

Variants (all [M, 256, 256] uint32, grid over limbs, same BlockSpecs as
the real kernel):
  copy        o = x                      (DMA floor)
  transpose   o = x.T                    (+ in-kernel relayout)
  mid         o = shoup(x, mid)          (+ mid-table DMA and one mul pass)
  stages1     stage-1 butterflies only
  stages2     stage-2 butterflies only
  full        the production ntt kernel
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import functools

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from homulator_tpu import benchlib
    from homulator_tpu.api import CkksEngine
    from homulator_tpu.ops.modmath import shoup_mul_lazy3
    from homulator_tpu.ops.ntt import ntt
    from homulator_tpu.ops.ntt_pallas import (
        _csub, _ct_stages_val, _slab, _SMEM_FULL,
    )
    from homulator_tpu.params import get_params

    n = 65536
    params = get_params(n=n, max_level=45, alpha=15)
    eng = CkksEngine(params, seed=1)
    dc = eng.dc
    M = 35
    nb = dc.ntt_basis(dc.main_rows(M))
    t = params.ntt
    n1, n2 = t.n1, t.n2
    l1 = n1.bit_length() - 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(
        0, 1 << 29, size=(M, n1, n2), dtype=np.uint64).astype(np.uint32))
    p1, p1s, mid, mids, p2, p2s = nb.pfwd

    def call(kernel, specs, args, out_rc):
        return pl.pallas_call(
            kernel, grid=(M,), in_specs=specs,
            out_specs=_slab(*out_rc),
            out_shape=jax.ShapeDtypeStruct((M,) + out_rc, jnp.uint32),
        )(*args)

    def k_copy(x_ref, o_ref):
        o_ref[0] = x_ref[0]

    def k_transpose(x_ref, o_ref):
        o_ref[0] = x_ref[0].T

    def k_mid(q_ref, mid_ref, mids_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = shoup_mul_lazy3(x_ref[0], mid_ref[0], mids_ref[0], q)
        o_ref[0] = _csub(_csub(a, q + q), q)

    def k_stages1(q_ref, p1_ref, p1s_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = _ct_stages_val(x_ref[0], p1_ref[0], p1s_ref[0], q, False)
        o_ref[0] = _csub(_csub(_csub(a, 4 * q), q + q), q)

    def double_transpose(y):
        z = call(k_transpose, [_slab(n1, n2)], (y,), (n2, n1))
        return call(k_transpose, [_slab(n2, n1)], (z,), (n1, n2))

    variants = {
        "copy": lambda it: _chain(lambda y: call(
            k_copy, [_slab(n1, n2)], (y,), (n1, n2)), x, it),
        # two kernels per iteration: report half below
        "transpose2": lambda it: _chain(double_transpose, x, it),
        "mid": lambda it: _chain(lambda y: call(
            k_mid, [_SMEM_FULL, _slab(n1, n2), _slab(n1, n2), _slab(n1, n2)],
            (nb.q.reshape(M, 1), mid, mids, y), (n1, n2)), x, it),
        "stages1": lambda it: _chain(lambda y: call(
            k_stages1, [_SMEM_FULL, _slab(n1, l1), _slab(n1, l1),
                        _slab(n1, n2)],
            (nb.q.reshape(M, 1), p1, p1s, y), (n1, n2)), x, it),
    }

    def _chain(step, x0, iters):
        def body(_, c):
            return step(c)
        return jax.lax.fori_loop(0, iters, body, x0)

    out = {}
    for name, fn in variants.items():
        jfn = jax.jit(fn)
        sec = benchlib.time_chained(jfn, 8, 400)
        per = sec / M / (2 if name == "transpose2" else 1)
        key = name.replace("2", "") + "_us_per_limb"
        out[key] = round(1e6 * per, 3)
        print(f"{name:12s} {out[key]:7.3f} us/limb")
    # reference: the production pair measurement
    pair = benchlib.ntt_pair_seconds(eng, ntt(x, nb), M)
    out["full_pair_half_us"] = round(1e6 * pair / (2 * M), 3)
    print(f"{'full(pair/2)':12s} {out['full_pair_half_us']:7.3f} us/limb")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
