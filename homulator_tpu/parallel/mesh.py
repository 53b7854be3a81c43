"""Device mesh construction for multi-chip CKKS.

The reference's parallel machine is `cluster` accelerator clusters joined
by a pull-on-miss NoC (SURVEY.md §2 "Parallelism & communication
inventory"); its two real work axes are RNS limbs (NTT/AUTO dispatched to
cluster `level % cluster`, Driver.h:158,178) and ciphertext batches.
TPU-native, those become mesh axes:

  'data' — ciphertext-batch data parallelism (embarrassingly parallel)
  'limb' — limb (RNS) parallelism; elementwise ops shard freely, base
           conversion contracts over limbs (XLA inserts the all-gather /
           reduce the NoC modeled on-miss)

Same code path 1 chip -> 1 host -> multi-host via jax.sharding.Mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, str] = ("data", "limb"),
) -> Mesh:
    """Build a ('data', 'limb') mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (1, n_devices)
    assert shape[0] * shape[1] == n_devices, (shape, n_devices)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def ct_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batched ciphertexts [B, 2, L, N]: batch over 'data', limbs over 'limb'."""
    return NamedSharding(mesh, P("data", None, "limb", None))


def limb_sharding(mesh: Mesh) -> NamedSharding:
    """Single ciphertext [2, L, N]: limbs over 'limb'."""
    return NamedSharding(mesh, P(None, "limb", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
