"""ctypes bindings for the native host-side engine (native/recode.cpp).

Loads zerocaf_tpu/_native/libzerocaf_native.so when present (built by
native/build.sh); every entry point has a pure-Python fallback so the
framework works without the native build.  The native path turns per-scalar
Python big-int recoding loops into tight C++ (the host-side analogue of the
reference's u64 backend being its performance layer).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from . import oracle

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libzerocaf_native.so")


def _load():
    global _LIB
    if _LIB is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        if lib.zerocaf_native_abi_version() == 1:
            _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_scalar_bytes(scalars_le: np.ndarray) -> np.ndarray:
    b = np.ascontiguousarray(scalars_le, dtype=np.uint8)
    assert b.shape[-1] == 32
    return b.reshape(-1, 32)


def _check_naf_domain(b: np.ndarray, nbits: int) -> None:
    """NAF/wNAF recodings can spill one digit past the MSB, so inputs must
    satisfy k < 2^(nbits-1) or the fixed-length digit array would silently
    truncate (the C++ loop caps at nbits; the Python oracle raises).  Enforce
    the same domain for both engines (VERDICT r2 item 7)."""
    if nbits > 256:
        # every 256-bit value fits nbits digits, but the C++ engine's u256
        # add-back would wrap for k within one window of 2^256: reject the
        # all-ones top byte (margin 2^8 > the largest half-window 2^(w-1))
        if (b[:, 31] == 0xFF).any():
            raise ValueError("naf/wnaf: input scalar within 2^248 of 2^256 "
                             "overflows the 256-bit recoding engine")
        return
    bits8 = np.unpackbits(b, axis=-1, bitorder="little")
    if bits8[:, nbits - 1:].any():
        raise ValueError(
            f"naf/wnaf: input scalar >= 2^{nbits - 1}; recoding needs more "
            f"than nbits={nbits} digits")


def naf(scalars_le: np.ndarray, nbits: int = 256) -> np.ndarray:
    """[..., 32] LE scalar bytes -> [..., nbits] int8 NAF digits."""
    b = _as_scalar_bytes(scalars_le)
    _check_naf_domain(b, nbits)
    n = b.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty((n, nbits), dtype=np.int8)
        lib.zerocaf_naf(b.ctypes.data_as(ctypes.c_void_p), n, nbits,
                        out.ctypes.data_as(ctypes.c_void_p))
    else:
        out = np.stack([
            np.array(oracle.compute_naf(int.from_bytes(row.tobytes(), "little"),
                                        nbits), dtype=np.int8)
            for row in b])
    return out.reshape(*scalars_le.shape[:-1], nbits)


def wnaf(scalars_le: np.ndarray, width: int, nbits: int = 256) -> np.ndarray:
    """[..., 32] LE scalar bytes -> [..., nbits] int8 windowed-NAF digits."""
    b = _as_scalar_bytes(scalars_le)
    _check_naf_domain(b, nbits)
    n = b.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty((n, nbits), dtype=np.int8)
        lib.zerocaf_wnaf(b.ctypes.data_as(ctypes.c_void_p), n, width, nbits,
                         out.ctypes.data_as(ctypes.c_void_p))
    else:
        out = np.stack([
            np.array(oracle.compute_window_naf(
                int.from_bytes(row.tobytes(), "little"), width, nbits),
                dtype=np.int8)
            for row in b])
    return out.reshape(*scalars_le.shape[:-1], nbits)


def bits(scalars_le: np.ndarray, nbits: int = 256) -> np.ndarray:
    b = _as_scalar_bytes(scalars_le)
    n = b.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty((n, nbits), dtype=np.int8)
        lib.zerocaf_bits(b.ctypes.data_as(ctypes.c_void_p), n, nbits,
                         out.ctypes.data_as(ctypes.c_void_p))
    else:
        bits8 = np.unpackbits(b, axis=-1, bitorder="little")
        out = bits8[:, :nbits].astype(np.int8)
    return out.reshape(*scalars_le.shape[:-1], nbits)


def windows(scalars_le: np.ndarray, c: int, nwin: int) -> np.ndarray:
    """Pippenger digit decomposition on the host: [..., nwin] int32."""
    b = _as_scalar_bytes(scalars_le)
    n = b.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty((n, nwin), dtype=np.int32)
        lib.zerocaf_windows(b.ctypes.data_as(ctypes.c_void_p), n, c, nwin,
                            out.ctypes.data_as(ctypes.c_void_p))
    else:
        bits8 = np.unpackbits(b, axis=-1, bitorder="little")
        pad = nwin * c - 256
        if pad > 0:
            bits8 = np.pad(bits8, [(0, 0), (0, pad)])
        groups = bits8[:, : nwin * c].reshape(n, nwin, c).astype(np.int32)
        out = (groups << np.arange(c, dtype=np.int32)).sum(-1).astype(np.int32)
    return out.reshape(*scalars_le.shape[:-1], nwin)


def bytes_to_limbs(bytes_le: np.ndarray) -> np.ndarray:
    b = _as_scalar_bytes(bytes_le)
    n = b.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty((n, 22), dtype=np.int32)
        lib.zerocaf_bytes_to_limbs(b.ctypes.data_as(ctypes.c_void_p), n,
                                   out.ctypes.data_as(ctypes.c_void_p))
    else:
        out = np.stack([
            np.array(oracle.int_to_limbs(int.from_bytes(row.tobytes(), "little")),
                     dtype=np.int32)
            for row in b])
    return out.reshape(*bytes_le.shape[:-1], 22)


def limbs_to_bytes(limbs: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(limbs, dtype=np.int32).reshape(-1, 22)
    n = x.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty((n, 32), dtype=np.uint8)
        lib.zerocaf_limbs_to_bytes(x.ctypes.data_as(ctypes.c_void_p), n,
                                   out.ctypes.data_as(ctypes.c_void_p))
    else:
        out = np.stack([
            np.frombuffer(int(oracle.limbs_to_int(row)).to_bytes(32, "little"),
                          dtype=np.uint8)
            for row in x])
    return out.reshape(*limbs.shape[:-1], 32)
