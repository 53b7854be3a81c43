#!/usr/bin/env python
"""NTT kernel grid-size study: per-transform time vs limb count M.

The phase profiler showed per-transform time GROWING with M (2.9 us at
M=8 vs 4.3 us at M=35). This measures the curve properly and tests a
chunked execution (several pallas_calls of <= CHUNK limbs instead of one
M-limb grid).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from homulator_tpu import benchlib
    from homulator_tpu.api import CkksEngine
    from homulator_tpu.ops.ntt import intt, ntt
    from homulator_tpu.params import get_params

    n = 65536
    params = get_params(n=n, max_level=45, alpha=15)
    eng = CkksEngine(params, seed=1)
    dc = eng.dc
    rng = np.random.default_rng(0)
    t = params.ntt

    @jax.jit
    def chain_pair(x, nb, iters):
        def body(_, c):
            return ntt(intt(c, nb), nb)
        return jax.lax.fori_loop(0, iters, body, x)

    def chunked_pair_fn(chunk):
        @jax.jit
        def chain(x, nbs, iters):
            def body(_, c):
                parts = []
                off = 0
                for nb in nbs:
                    m = nb.q.shape[0]
                    parts.append(ntt(intt(c[off:off + m], nb), nb))
                    off += m
                return jnp.concatenate(parts, axis=0)
            return jax.lax.fori_loop(0, iters, body, x)
        return chain

    out = {}
    for M in (4, 8, 16, 24, 35, 50, 60):
        rows = tuple(range(min(M, 45))) + tuple(
            range(45, 45 + max(0, M - 45)))
        nb = dc.ntt_basis(rows)
        x = jnp.asarray(rng.integers(
            0, 1 << 29, size=(M, t.n2, t.n1), dtype=np.uint64
        ).astype(np.uint32))
        k2 = max(60, int(12000 / M))
        sec = benchlib.time_chained(chain_pair, 8, k2, x, nb)
        out[f"M{M}_us_per_transform"] = round(1e6 * sec / (2 * M), 3)
        print(f"M={M:3d}  {out[f'M{M}_us_per_transform']:6.3f} us/transform"
              f" (k2={k2})")

    # chunked variants at M=50 (the ext basis size)
    M = 50
    rows = tuple(range(45)) + tuple(range(45, 50))
    x = jnp.asarray(rng.integers(
        0, 1 << 29, size=(M, t.n2, t.n1), dtype=np.uint64).astype(np.uint32))
    for chunk in (8, 16, 25):
        nbs = tuple(
            dc.ntt_basis(rows[i:i + chunk]) for i in range(0, M, chunk)
        )
        fn = chunked_pair_fn(chunk)
        sec = benchlib.time_chained(fn, 8, 240, x, nbs)
        key = f"M50_chunk{chunk}_us_per_transform"
        out[key] = round(1e6 * sec / (2 * M), 3)
        print(f"M=50 chunk={chunk:3d}  {out[key]:6.3f} us/transform")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
