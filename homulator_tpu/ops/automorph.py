"""Galois automorphism (rotation/conjugation) in the evaluation domain.

The reference models this as the AUTOU log-stage coefficient-swap network
(include/Components.h:201-238). On TPU, with ciphertexts resident in the
evaluation domain, sigma_g is a fixed slot permutation precomputed in our
NTT's native evaluation order (params.CkksParams.automorph_eval_perm); the
kernel is a single gather along the coefficient axis, identical for every
limb.
"""

from __future__ import annotations

import jax.numpy as jnp


def automorph_eval(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """x: [..., n2, n1] eval-domain tiles; perm: int32[N] gather indices
    over the flat eval order (the gather works on the flattened slot
    axis; device data is 3-D elsewhere, see ops/ntt.py)."""
    r, c = x.shape[-2:]
    flat = x.reshape(x.shape[:-2] + (r * c,))
    return jnp.take(flat, perm, axis=-1).reshape(x.shape)
