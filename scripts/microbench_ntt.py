"""Microbenchmark the NTT Pallas kernel's internal phases.

Variants (each a standalone pallas_call over the same [M, n1, n2] slabs):
  full      — the production ntt_pallas kernel
  stages1   — only the 8 stage-1 CT butterfly stages
  stages2x  — 16 CT stages (stage-1 run twice) — isolates per-stage cost
  midT      — only mid twiddle + transpose
  copy      — load + store only (DMA floor)

Prints per-limb-transform microseconds for each, M=35 at N=2^16.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from homulator_tpu.benchlib import time_chained
from homulator_tpu.ops.modmath import shoup_mul_lazy
from homulator_tpu.ops.ntt_pallas import _csub, _ct_stages_val, _slab, _SMEM_FULL
from homulator_tpu.params import get_params


def make_variant(which: str):
    def kernel(q_ref, p1_ref, p1s_ref, mid_ref, mids_ref, p2_ref, p2s_ref,
               x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = x_ref[0]
        if which == "full":
            a = _ct_stages_val(a, p1_ref[0], p1s_ref[0], q, False)
            a = shoup_mul_lazy(a, mid_ref[0], mids_ref[0], q)
            a = a.T
            a = _ct_stages_val(a, p2_ref[0], p2s_ref[0], q, False)
            o_ref[0] = _csub(_csub(a, q + q), q)
        elif which == "stages1":
            a = _ct_stages_val(a, p1_ref[0], p1s_ref[0], q, False)
            o_ref[0] = _csub(_csub(a, q + q), q).T
        elif which == "stages2x":
            a = _ct_stages_val(a, p1_ref[0], p1s_ref[0], q, False)
            a = _csub(_csub(a, q + q), q)
            a = _ct_stages_val(a, p1_ref[0], p1s_ref[0], q, False)
            o_ref[0] = _csub(_csub(a, q + q), q).T
        elif which == "midT":
            a = shoup_mul_lazy(a, mid_ref[0], mids_ref[0], q)
            o_ref[0] = _csub(a, q).T
        elif which == "copy":
            o_ref[0] = x_ref[0].T
        else:
            raise ValueError(which)

    return kernel


def run_variant(which, x, q, pfwd, n1, n2):
    M = x.shape[0]
    p1, p1s, mid, mids, p2, p2s = pfwd
    l1 = n1.bit_length() - 1
    l2 = n2.bit_length() - 1

    call = pl.pallas_call(
        make_variant(which),
        grid=(M,),
        in_specs=[
            _SMEM_FULL,
            _slab(n1, l1), _slab(n1, l1),
            _slab(n1, n2), _slab(n1, n2),
            _slab(n2, l2), _slab(n2, l2),
            _slab(n1, n2),
        ],
        out_specs=_slab(n2, n1),
        out_shape=jax.ShapeDtypeStruct((M, n2, n1), jnp.uint32),
    )

    @jax.jit
    def chain(x, q2d, p1, p1s, mid, mids, p2, p2s, iters):
        def body(_, carry):
            out = call(q2d, p1, p1s, mid, mids, p2, p2s, carry)
            return jnp.transpose(out, (0, 2, 1))
        return jax.lax.fori_loop(0, iters, body, x)

    q2d = q.reshape(M, 1)
    t = min(
        time_chained(chain, 8, 208, x, q2d, p1, p1s, mid, mids, p2, p2s)
        for _ in range(3)
    )
    per = t / M * 1e6
    print(f"{which:10s} {per:8.3f} us/limb   ({t*1e3:.3f} ms per call, M={M})")
    return per


def main():
    params = get_params(n=1 << 16, max_level=45, alpha=15)
    from homulator_tpu.api import CkksEngine

    eng = CkksEngine(params, seed=1)
    dc = eng.dc
    nt = dc.ntt_basis(tuple(range(35)))
    n1, n2 = nt.n1, nt.n2
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 1 << 28, size=(35, n1, n2), dtype=np.uint32)
    )
    q = jnp.asarray(nt.q)
    for which in ("copy", "midT", "stages1", "stages2x", "full"):
        run_variant(which, x, q, nt.pfwd, n1, n2)


if __name__ == "__main__":
    main()
