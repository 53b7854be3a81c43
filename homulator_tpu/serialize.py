"""Checkpoint / resume: key material and ciphertext serialization.

The reference has no persistence at all (SURVEY.md §5 "Checkpoint /
resume. Absent entirely"); a deployable framework needs it. Formats are
plain .npz with a version + parameter fingerprint so loads fail loudly on
mismatched contexts.
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

FORMAT_VERSION = 1


def _fingerprint(params) -> str:
    return json.dumps({
        "v": FORMAT_VERSION,
        "n": params.n,
        "max_level": params.max_level,
        "alpha": params.alpha,
        "scale_bits": params.scale_bits,
        "q0": params.qs[0],
    })


def save_keys(path: str, ref) -> None:
    """Persist secret + relinearization + rotation keys of a RefCkks."""
    arrays: Dict[str, np.ndarray] = {
        "s_coeff": ref.s_coeff,
        "relin": np.stack(ref.relin_key.digits),
    }
    for step, key in getattr(ref, "rot_keys", {}).items():
        arrays[f"rot_{step}"] = np.stack(key.digits)
    np.savez_compressed(path, fingerprint=_fingerprint(ref.p), **arrays)


def load_keys(path: str, ref) -> None:
    """Restore keys into a RefCkks (verifies the parameter fingerprint).

    Recomputes the eval-domain secret from s_coeff, so the load is
    self-consistent with the context's NTT tables.
    """
    from .refimpl import KeySwitchKey

    with np.load(path, allow_pickle=False) as z:
        fp = str(z["fingerprint"])
        if fp != _fingerprint(ref.p):
            raise ValueError(f"key file context mismatch: {fp}")
        ref.s_coeff = z["s_coeff"]
        all_idx = np.arange(ref.p.num_primes)
        ref.s_eval = ref.ntt(ref.signed_to_rns(ref.s_coeff, all_idx), all_idx)
        ref.relin_key = KeySwitchKey(digits=list(z["relin"]))
        ref.rot_keys = {}
        for name in z.files:
            if name.startswith("rot_"):
                ref.rot_keys[int(name[4:])] = KeySwitchKey(digits=list(z[name]))


def save_ciphertext(path: str, ct, params) -> None:
    np.savez_compressed(
        path,
        fingerprint=_fingerprint(params),
        data=np.asarray(ct.data).astype(np.uint32),
        level=np.int64(ct.level),
        scale=np.float64(ct.scale),
        domain=np.bytes_(ct.domain.encode()),
    )


def load_ciphertext(path: str, dc):
    from .context import Ciphertext

    with np.load(path, allow_pickle=False) as z:
        if str(z["fingerprint"]) != _fingerprint(dc.params):
            raise ValueError("ciphertext context mismatch")
        import jax.numpy as jnp

        return Ciphertext(
            jnp.asarray(z["data"]),
            int(z["level"]),
            float(z["scale"]),
            z["domain"].item().decode(),
        )
