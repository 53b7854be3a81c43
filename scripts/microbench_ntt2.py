"""Test cheaper shoup_mul_lazy formulations inside the NTT stage loop.

Variants:
  base      — production _ct_stages_val (16 stages via 2x stage-1 tables)
  natmul    — mullo32 replaced by native wrapping uint32 multiply
  approx    — natmul + 3-multiply approximate mulhi (result in [0,3q));
              NOT bit-exact range-wise (values differ pre-reduction), used
              here only for timing. Needs q < 2^32/6 for a real kernel.

Each runs 16 CT stages so numbers compare directly with microbench_ntt's
stages2x (7.125 us/limb).
"""

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
from homulator_tpu.ops.ntt_pallas import _csub, _slab, _SMEM_FULL
from homulator_tpu.params import get_params

_U16 = 0xFFFF
_S = 16


def shoup_natmul(a, w, wsh, q):
    """shoup_mul_lazy with native wrapping u32 mults for the low halves."""
    a0 = a & _U16
    a1 = a >> _S
    b0 = wsh & _U16
    b1 = wsh >> _S
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    carry_mid = (mid < lh).astype(jnp.uint32)
    lo = ll + (mid << _S)
    carry_lo = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> _S) + (carry_mid << _S) + carry_lo
    return a * w - hi * q


def shoup_approx(a, w, wsh, q):
    """3-mult approximate mulhi (err <= 1) + native low mults: [0, 3q)."""
    a0 = a & _U16
    a1 = a >> _S
    b0 = wsh & _U16
    b1 = wsh >> _S
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    carry_mid = (mid < lh).astype(jnp.uint32)
    hi = hh + (mid >> _S) + (carry_mid << _S)
    return a * w - hi * q


def make_stages(shoup_fn):
    def ct_stage_slice(a, w_col, wsh_col, H, q):
        n, m = a.shape
        B = n // (2 * H)
        a3 = a.reshape(B, 2 * H, m)
        w3 = w_col.reshape(B, 2 * H, 1)
        wsh3 = wsh_col.reshape(B, 2 * H, 1)
        q2 = q + q
        u = _csub(a3[:, :H], q2)
        v = shoup_fn(a3[:, H:], w3[:, H:], wsh3[:, H:], q)
        return jnp.concatenate([u + v, u - v + q2], axis=1).reshape(n, m)

    def ct_stage_roll(a, w_col, wsh_col, H, q):
        n = a.shape[0]
        row = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
        first = (row & H) == 0
        q2 = q + q
        down = pltpu.roll(a, (-H) % n, axis=0)
        up = pltpu.roll(a, H, axis=0)
        p = jnp.where(first, down, up)
        u = _csub(jnp.where(first, a, p), q2)
        t = shoup_fn(jnp.where(first, p, a), w_col, wsh_col, q)
        return jnp.where(first, u + t, u - t + q2)

    def stages(a, w_cols, wsh_cols, q):
        n = a.shape[0]
        logn = n.bit_length() - 1
        for s in range(logn):
            H = n >> (s + 1)
            w = w_cols[:, s: s + 1]
            wsh = wsh_cols[:, s: s + 1]
            if H >= 8:
                a = ct_stage_slice(a, w, wsh, H, q)
            else:
                a = ct_stage_roll(a, w, wsh, H, q)
        return a

    return stages


def make_kernel(which):
    if which == "base":
        from homulator_tpu.ops.ntt_pallas import _ct_stages_val

        def stages(a, w, wsh, q):
            return _ct_stages_val(a, w, wsh, q, False)
    elif which == "natmul":
        stages = make_stages(shoup_natmul)
    elif which == "approx":
        stages = make_stages(shoup_approx)
    else:
        raise ValueError(which)

    def kernel(q_ref, p1_ref, p1s_ref, x_ref, o_ref):
        i = pl.program_id(0)
        q = q_ref[i, 0]
        a = x_ref[0]
        a = stages(a, p1_ref[0], p1s_ref[0], q)
        a = _csub(_csub(_csub(a, q + q + q + q), q + q), q)
        a = stages(a, p1_ref[0], p1s_ref[0], q)
        o_ref[0] = _csub(_csub(_csub(a, q + q + q + q), q + q), q).T

    return kernel


def run_variant(which, x, q, pfwd, n1, n2):
    M = x.shape[0]
    p1, p1s = pfwd[0], pfwd[1]
    l1 = n1.bit_length() - 1
    call = pl.pallas_call(
        make_kernel(which),
        grid=(M,),
        in_specs=[_SMEM_FULL, _slab(n1, l1), _slab(n1, l1), _slab(n1, n2)],
        out_specs=_slab(n2, n1),
        out_shape=jax.ShapeDtypeStruct((M, n2, n1), jnp.uint32),
    )

    @jax.jit
    def chain(x, q2d, p1, p1s, iters):
        def body(_, carry):
            return jnp.transpose(call(q2d, p1, p1s, carry), (0, 2, 1))
        return jax.lax.fori_loop(0, iters, body, x)

    q2d = q.reshape(M, 1)
    t = min(time_chained(chain, 8, 208, x, q2d, p1, p1s) for _ in range(3))
    print(f"{which:8s} {t / M * 1e6:8.3f} us/limb (16 stages)")


def main():
    params = get_params(n=1 << 16, max_level=45, alpha=15)
    from homulator_tpu.api import CkksEngine

    eng = CkksEngine(params, seed=1)
    nt = eng.dc.ntt_basis(tuple(range(35)))
    n1, n2 = nt.n1, nt.n2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 28, size=(35, n1, n2), dtype=np.uint32))
    q = jnp.asarray(nt.q)
    for which in ("base", "natmul", "approx"):
        run_variant(which, x, q, nt.pfwd, n1, n2)


if __name__ == "__main__":
    main()
