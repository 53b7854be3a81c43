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
    """x: [..., N] eval-domain limbs; perm: int32[N] gather indices."""
    return jnp.take(x, perm, axis=-1)
