"""Test configuration: force the CPU backend with 8 virtual devices.

The axon sitecustomize pins JAX_PLATFORMS=axon (single real TPU via a
tunnel); tests must run on CPU — including the multi-chip sharding tests,
which use 8 virtual host devices (SURVEY.md §4 test strategy).
jax.config.update happens before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from homulator_tpu.api import CkksEngine  # noqa: E402
from homulator_tpu.params import CkksParams, get_params  # noqa: E402


@pytest.fixture(scope="session")
def small_params() -> CkksParams:
    """Small but structurally complete: 3 digits incl. a partial one."""
    return get_params(n=64, max_level=6, alpha=2)


@pytest.fixture(scope="session")
def small_engine(small_params) -> CkksEngine:
    eng = CkksEngine(small_params, seed=7)
    eng.keygen()
    return eng


@pytest.fixture(scope="session")
def medium_params() -> CkksParams:
    """Odd log2(N) so n1 != n2, alpha not dividing level."""
    return get_params(n=128, max_level=5, alpha=3)


@pytest.fixture(scope="session")
def medium_engine(medium_params) -> CkksEngine:
    eng = CkksEngine(medium_params, seed=11)
    eng.keygen()
    return eng


def random_limbs(params, idx, rng) -> np.ndarray:
    return np.stack(
        [rng.integers(0, int(q), size=params.n, dtype=np.uint64) for q in params.q_arr[idx]]
    )
