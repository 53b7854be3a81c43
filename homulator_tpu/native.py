"""ctypes bindings for the native host core (native/ckks_core.cpp).

Loads libckks_core.so if present (build with `make -C native`); callers
fall back to the numpy reference path when unavailable. The native kernels
are bit-identical to refimpl.py (asserted in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_U64P = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "libckks_core.so",
    )


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    c_int, c_ll = ctypes.c_int, ctypes.c_longlong
    lib.ckks_ntt_fwd.argtypes = [_U64P, c_int, c_int, c_int, _U64P, _U64P, _U64P, _U64P]
    lib.ckks_ntt_inv.argtypes = [_U64P, c_int, c_int, c_int, _U64P, _U64P, _U64P, _U64P]
    for f in (lib.ckks_ewe_mul, lib.ckks_ewe_add, lib.ckks_ewe_sub):
        f.argtypes = [_U64P, _U64P, _U64P, c_int, c_ll, _U64P]
    lib.ckks_bconv.argtypes = [_U64P, _U64P, _U64P, c_int, c_int, c_ll, _U64P]
    lib.ckks_core_version.restype = c_int
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


class NativeNtt:
    """Per-params flattened tables for the native NTT (psi_br layout)."""

    def __init__(self, params):
        self.p = params
        t = params.ntt
        K = params.num_primes
        self.n1, self.n2 = t.n1, t.n2

        def flat(stages, n):
            out = np.zeros((K, n), dtype=np.uint64)
            for s, arr in enumerate(stages):
                out[:, (1 << s): (1 << (s + 1))] = arr
            return np.ascontiguousarray(out)

        self.psi1 = flat(t.sub1.stage_tw, t.n1)
        self.psi2 = flat(t.sub2.stage_tw, t.n2)
        self.ipsi1 = flat(t.sub1.inv_stage_tw, t.n1)
        self.ipsi2 = flat(t.sub2.inv_stage_tw, t.n2)
        self.tw_mid = np.ascontiguousarray(t.tw_mid.reshape(K, -1))
        self.tw_mid_inv = np.ascontiguousarray(t.tw_mid_inv.reshape(K, -1))
        self.qs = np.ascontiguousarray(params.q_arr)

    def _rows(self, idx):
        idx = np.asarray(idx)
        return (
            np.ascontiguousarray(self.qs[idx]),
            np.ascontiguousarray(self.psi1[idx]),
            np.ascontiguousarray(self.tw_mid[idx]),
            np.ascontiguousarray(self.psi2[idx]),
            np.ascontiguousarray(self.ipsi1[idx]),
            np.ascontiguousarray(self.tw_mid_inv[idx]),
            np.ascontiguousarray(self.ipsi2[idx]),
        )

    def ntt(self, x: np.ndarray, idx) -> np.ndarray:
        lib = load()
        assert lib is not None
        qs, p1, mid, p2, _, _, _ = self._rows(idx)
        out = np.ascontiguousarray(x, dtype=np.uint64).copy()
        lib.ckks_ntt_fwd(out, out.shape[0], self.n1, self.n2, qs, p1, mid, p2)
        return out

    def intt(self, x: np.ndarray, idx) -> np.ndarray:
        lib = load()
        assert lib is not None
        qs, _, _, _, ip1, midi, ip2 = self._rows(idx)
        out = np.ascontiguousarray(x, dtype=np.uint64).copy()
        lib.ckks_ntt_inv(out, out.shape[0], self.n1, self.n2, qs, ip1, midi, ip2)
        return out
