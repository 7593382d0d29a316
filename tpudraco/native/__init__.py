"""Native (C++) fast paths, loaded via ctypes with automatic build.

The library is compiled on first use with g++ -O3 into this package's
build/ directory; every entry point has a pure-Python fallback in
tpudraco.entropy, so the codec works (slowly) without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc")
_BUILD = os.path.join(_HERE, "build")
_lib = None
_tried = False


def _source_hash() -> str:
    h = hashlib.sha256()
    for name in sorted(os.listdir(_SRC)):
        if name.endswith(".cpp") or name.endswith(".h"):
            with open(os.path.join(_SRC, name), "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


def load_library():
    """Returns the ctypes library or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TPUDRACO_NO_NATIVE"):
        return None
    try:
        os.makedirs(_BUILD, exist_ok=True)
        so_path = os.path.join(_BUILD, f"libtpudraco_{_source_hash()}.so")
        if not os.path.isfile(so_path):
            srcs = [os.path.join(_SRC, n) for n in sorted(os.listdir(_SRC))
                    if n.endswith(".cpp")]
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp] + srcs,
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        i64, i32, u8p, i32p = (ctypes.c_int64, ctypes.c_int32,
                               ctypes.POINTER(ctypes.c_uint8),
                               ctypes.POINTER(ctypes.c_int32))
        lib.tpud_rans_encode.restype = i64
        lib.tpud_rans_encode.argtypes = [i32p, i64, i32p, i32p, i32, i64,
                                         u8p, i64]
        lib.tpud_rans_decode.restype = i32
        lib.tpud_rans_decode.argtypes = [u8p, i64, i32p, i32p, i32p, i32,
                                         i64, i64, i32p]
        lib.tpud_rabs_encode.restype = i64
        lib.tpud_rabs_encode.argtypes = [u8p, i64, i32, i32, i64, u8p, i64]
        lib.tpud_rabs_decode.restype = i32
        lib.tpud_rabs_decode.argtypes = [u8p, i64, i32, i32, i64, i64, u8p]
        _lib = lib
    except Exception as exc:
        # fall back to the pure-Python paths, but loudly: a silent 15x
        # slowdown is much harder to notice than a warning
        import warnings
        detail = ""
        if isinstance(exc, subprocess.CalledProcessError):
            detail = (exc.stderr or b"").decode("utf-8", "replace")[:500]
        warnings.warn(
            f"tpudraco native build unavailable ({exc!r}) {detail}; "
            "using pure-Python fallbacks", RuntimeWarning)
        _lib = None
    return _lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rans_encode(symbols: np.ndarray, freqs: np.ndarray, cums: np.ndarray,
                precision: int, l_base: int) -> bytes | None:
    lib = load_library()
    if lib is None:
        return None
    symbols = np.ascontiguousarray(symbols, dtype=np.int32)
    freqs = np.ascontiguousarray(freqs, dtype=np.int32)
    cums = np.ascontiguousarray(cums, dtype=np.int32)
    cap = len(symbols) * 8 + 16
    out = np.empty(cap, dtype=np.uint8)
    n = lib.tpud_rans_encode(_i32p(symbols), len(symbols), _i32p(freqs),
                             _i32p(cums), precision, l_base, _u8p(out), cap)
    if n < 0:
        raise ValueError("native rANS encode failed")
    return out[:n].tobytes()


def rans_decode(blob: bytes, freqs: np.ndarray, cums: np.ndarray,
                slots: np.ndarray, precision: int, l_base: int,
                n: int) -> np.ndarray | None:
    lib = load_library()
    if lib is None:
        return None
    buf = np.frombuffer(blob, dtype=np.uint8)
    freqs = np.ascontiguousarray(freqs, dtype=np.int32)
    cums = np.ascontiguousarray(cums, dtype=np.int32)
    slots = np.ascontiguousarray(slots, dtype=np.int32)
    out = np.empty(n, dtype=np.int32)
    rc = lib.tpud_rans_decode(_u8p(buf), len(buf), _i32p(freqs), _i32p(cums),
                              _i32p(slots), precision, l_base, n, _i32p(out))
    if rc != 0:
        raise ValueError("native rANS decode failed")
    return out


def rabs_encode(bits: np.ndarray, freq0: int, precision: int,
                l_base: int) -> bytes | None:
    lib = load_library()
    if lib is None:
        return None
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    cap = len(bits) * 2 + 16
    out = np.empty(cap, dtype=np.uint8)
    n = lib.tpud_rabs_encode(_u8p(bits), len(bits), freq0, precision,
                             l_base, _u8p(out), cap)
    if n < 0:
        raise ValueError("native RAbS encode failed")
    return out[:n].tobytes()


def rabs_decode(blob: bytes, freq0: int, precision: int, l_base: int,
                n: int) -> np.ndarray | None:
    lib = load_library()
    if lib is None:
        return None
    buf = np.frombuffer(blob, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint8)
    rc = lib.tpud_rabs_decode(_u8p(buf), len(buf), freq0, precision,
                              l_base, n, _u8p(out))
    if rc != 0:
        raise ValueError("native RAbS decode failed")
    return out
