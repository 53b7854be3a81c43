"""3-stage grid-permutation decomposition (ops/perm_decomp.py) and the
staged automorphism kernel vs the flat gather."""

import numpy as np

from homulator_tpu.ops.automorph import automorph_eval, automorph_eval_staged
from homulator_tpu.ops.perm_decomp import apply_staged_np, decompose_grid_perm


def test_decompose_random_perms():
    rng = np.random.default_rng(2)
    for (R, C) in [(8, 8), (16, 4), (32, 16), (64, 64)]:
        perm = rng.permutation(R * C)
        s1, s2, s3 = decompose_grid_perm(perm, R, C)
        x = rng.integers(0, 1 << 30, size=(R, C), dtype=np.uint64)
        out = apply_staged_np(x, s1, s2, s3)
        assert np.array_equal(out.ravel(), x.ravel()[perm]), (R, C)


def test_staged_automorph_matches_flat(medium_engine):
    """For every rotation step the staged kernel is bit-identical to the
    flat gather (n1 != n2 tile: medium params)."""
    eng = medium_engine
    p = eng.params
    rng = np.random.default_rng(3)
    t = p.ntt
    x = rng.integers(0, 1 << 30, size=(4, t.n2, t.n1), dtype=np.uint64
                     ).astype(np.uint32)
    import jax.numpy as jnp

    xj = jnp.asarray(x)
    for step in (1, 2, 5, -3):
        g = p.galois_elt(step)
        perm = eng.dc.automorph_perm(g)
        s1, s2, s3 = eng.dc.automorph_stage_maps(g)
        flat = np.asarray(automorph_eval(xj, perm))
        staged = np.asarray(automorph_eval_staged(xj, s1, s2, s3))
        assert np.array_equal(flat, staged), step
    # conjugation element too
    g = p.galois_conj
    perm = eng.dc.automorph_perm(g)
    s1, s2, s3 = eng.dc.automorph_stage_maps(g)
    assert np.array_equal(
        np.asarray(automorph_eval(xj, perm)),
        np.asarray(automorph_eval_staged(xj, s1, s2, s3)),
    )
