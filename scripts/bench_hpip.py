"""A/B the fused HPIP kernel against the unfused pieces path, same session.

Both chains share the ModUp front (intt(35) + 3 fused bconvs); the delta
isolates {NTT of 115 ext rows + XLA-fused inner product} vs the single
fused ModUp-NTT+IP kernel (ops/hpip_pallas.py). Run on the TPU chip.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from homulator_tpu.api import CkksEngine
from homulator_tpu.benchlib import time_chained
from homulator_tpu.ops.keyswitch import (
    hpip_acc, inner_product_pieces, modup_conv_all, modup_convs_coeff,
)
from homulator_tpu.params import get_params


@jax.jit
def chain_fused(x, evk, kt, iters):
    def body(_, carry):
        acc = hpip_acc(modup_convs_coeff(carry, kt), carry, evk, kt)
        return acc[0, kt.special_nt.q.shape[0]:]
    return jax.lax.fori_loop(0, iters, body, x)


@jax.jit
def chain_pieces(x, evk, kt, iters):
    def body(_, carry):
        convs = modup_conv_all(carry, kt)
        acc0, _ = inner_product_pieces(convs, carry, evk, kt)
        return acc0[1]
    return jax.lax.fori_loop(0, iters, body, x)


@jax.jit
def chain_hpip_only(convs, x, evk, kt, iters):
    """The kernel alone (static convs — measures kernel incl. evk stream)."""
    def body(_, carry):
        acc = hpip_acc(convs, carry, evk, kt)
        return acc[0, kt.special_nt.q.shape[0]:]
    return jax.lax.fori_loop(0, iters, body, x)


def main():
    params = get_params(n=1 << 16, max_level=45, alpha=15)
    eng = CkksEngine(params, seed=1)
    eng.keygen()
    level = 35
    kt = eng.dc.keyswitch_tables(level)
    evk = eng.relin_key

    rng = np.random.default_rng(0)
    m = np.zeros(params.n, dtype=np.int64)
    m[: params.n // 2] = rng.integers(-100, 100, size=params.n // 2)
    ct = eng.encrypt_ints(m, level, 2.0**29)
    x = ct.data[0]
    convs = jax.block_until_ready(modup_convs_coeff(x, kt))

    for name, fn, args in (
        ("fused  intt+bconv+HPIP", chain_fused, (x, evk, kt)),
        ("pieces intt+bconv+ntt+IP", chain_pieces, (x, evk, kt)),
        ("HPIP kernel only", chain_hpip_only, (convs, x, evk, kt)),
    ):
        ts = sorted(time_chained(fn, 4, 100, *args) for _ in range(3))
        print(f"{name:26s} {ts[0] * 1e3:8.3f} ms  (median {ts[1] * 1e3:.3f})")


if __name__ == "__main__":
    main()
