"""Galois automorphism (rotation/conjugation) in the evaluation domain.

The reference models this as the AUTOU log-stage coefficient-swap network
(include/Components.h:201-238). On TPU, with ciphertexts resident in the
evaluation domain, sigma_g is a fixed slot permutation precomputed in our
NTT's native evaluation order (params.CkksParams.automorph_eval_perm); the
kernel is a single gather along the coefficient axis, identical for every
limb.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def automorph_eval(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """x: [..., n2, n1] eval-domain tiles; perm: int32[N] gather indices
    over the flat eval order (the gather works on the flattened slot
    axis; device data is 3-D elsewhere, see ops/ntt.py)."""
    r, c = x.shape[-2:]
    flat = x.reshape(x.shape[:-2] + (r * c,))
    return jnp.take(flat, perm, axis=-1).reshape(x.shape)


def automorph_eval_staged(x: jnp.ndarray, s1: jnp.ndarray, s2: jnp.ndarray,
                          s3: jnp.ndarray) -> jnp.ndarray:
    """3-stage form of the same permutation: sublane gather, lane gather,
    sublane gather (ops/perm_decomp.py — the routing-network realization
    of the reference's AUTOU stage fabric, include/Components.h:201-238).
    x: [..., n2, n1]; s*: int32[n2, n1] stage maps. Bit-identical to
    automorph_eval(x, perm) for maps built from the same perm."""
    nd = x.ndim - 2
    s1b = s1.reshape((1,) * nd + s1.shape)
    s2b = s2.reshape((1,) * nd + s2.shape)
    s3b = s3.reshape((1,) * nd + s3.shape)
    t1 = jnp.take_along_axis(x, s1b, axis=-2)
    t2 = jnp.take_along_axis(t1, s2b, axis=-1)
    return jnp.take_along_axis(t2, s3b, axis=-2)


def automorph_eval_sharded(x: jnp.ndarray, perm: jnp.ndarray,
                           axis: str) -> jnp.ndarray:
    """SPMD body (inside shard_map): x is the local column slice
    [..., n2, n1/ns] of an eval-domain tile sharded on its trailing axis
    over mesh axis `axis`. sigma_g moves slots arbitrarily across devices
    (the reference's AUTOU swap network crossing cluster lanes,
    include/Components.h:201-238), so the tile is all-gathered over ICI,
    permuted locally, and re-sliced to this device's columns."""
    full = jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True)
    rot = automorph_eval(full, perm)
    c = x.shape[-1]
    i = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(rot, i * c, c, axis=x.ndim - 1)
