"""Sharded (multi-chip) operation graphs.

Round-1 design: the jnp op graphs (ops/ntt.py path) are pure elementwise /
contraction programs over [.., L, N] limb arrays, so GSPMD partitions them
directly from input shardings — the scaling-book recipe (pick a mesh,
annotate shardings, let XLA insert collectives):

  * limb axis over 'limb': NTT butterflies and EWE lanes are limb-local
    (the reference's limb-per-cluster dispatch, Driver.h:158); base
    conversion contracts over limbs, for which XLA inserts the
    all-gather/reduce that the reference models as pull-on-miss NoC copies
    (mem.h:612-633).
  * ciphertext-batch axis over 'data': batched ops vmap over a leading
    batch axis — pure data parallelism for serving workloads.

The Pallas kernels are single-chip programs; under a mesh we use the jnp
path (ntt_mode='jnp') so the SPMD partitioner owns the layout. Fusing the
Pallas kernels with shard_map + explicit collectives is the planned next
step (coefficient-axis sharding with the NTT inter-transpose as an ICI
all_to_all).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..api import hmult_graph
from ..context import DeviceContext


def batched_hmult_fn(dc: DeviceContext, level: int):
    """Returns f(a_batch, b_batch, evk) -> out_batch for [B, 2, level, N]."""
    kt = dc.keyswitch_tables(level)
    last_nt = dc.ntt_basis((level - 1,))
    out_nt = dc.ntt_basis(dc.main_rows(level - 1))
    rs = dc.rescale_qinv_mont(level)

    def f(a_batch, b_batch, evk):
        def one(a, b):
            return hmult_graph(a, b, evk, kt, last_nt, out_nt, rs)

        return jax.vmap(one)(a_batch, b_batch)

    return f


def make_sharded_hmult(dc: DeviceContext, level: int, mesh: Mesh):
    """jit-compiled batched hmult. Input shardings: ciphertext batch over
    'data', RNS limbs over 'limb', and — when the mesh has a 'coeff' axis —
    the trailing coefficient-tile axis over 'coeff' (the sequence-parallel
    analog: GSPMD lowers the 4-step NTT's [R, C] transpose under that
    sharding to the cross-device all-to-all the reference models as its
    interTrans stage, config_4.cfg:48)."""
    f = batched_hmult_fn(dc, level)
    co = "coeff" if "coeff" in mesh.axis_names else None
    ct_shard = NamedSharding(mesh, P("data", None, "limb", None, co))
    evk_shard = NamedSharding(mesh, P(None, None, "limb", None, co))
    # Output sharding is left to the partitioner: the rescaled level-1 limb
    # count need not divide the 'limb' axis.
    return jax.jit(f, in_shardings=(ct_shard, ct_shard, evk_shard))
