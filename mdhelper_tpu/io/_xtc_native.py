"""
Loader for the native XTC codec
===============================

Builds :mod:`mdhelper_tpu/io/_xtc_native.cpp` on demand with the
system C++ compiler (cached next to the source, keyed by a source
hash) and exposes the two entry points through :mod:`ctypes`.  Pure
infrastructure: the algorithmic reference lives in
:mod:`mdhelper_tpu.io.xtc`, which transparently falls back to its
Python implementation when no compiler is available.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["load", "native_decompress", "native_compress"]

_SRC = os.path.join(os.path.dirname(__file__), "_xtc_native.cpp")
_lib = None
_tried = False


def _build(source: str, target: str) -> bool:
    compilers = ("g++", "c++", "clang++")
    for cxx in compilers:
        try:
            with tempfile.TemporaryDirectory() as tmp:
                tmp_so = os.path.join(tmp, "xtc.so")
                result = subprocess.run(
                    [
                        cxx, "-O3", "-fPIC", "-shared",
                        "-o", tmp_so, source,
                    ],
                    capture_output=True,
                    timeout=120,
                )
                if result.returncode != 0:
                    continue
                os.replace(tmp_so, target)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def load():
    """Return the ctypes library, building it if needed; ``None`` when
    unavailable (no source, no compiler, build failure)."""

    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("MDTPU_NO_NATIVE_XTC"):
        return None
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    target = os.path.join(
        os.path.dirname(_SRC), f"_xtc_native-{digest}.so"
    )
    if not os.path.exists(target) and not _build(_SRC, target):
        return None
    try:
        lib = ctypes.CDLL(target)
    except OSError:
        return None
    lib.xtc_decompress.restype = ctypes.c_long
    lib.xtc_decompress.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.xtc_compress.restype = ctypes.c_long
    lib.xtc_compress.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_long,
    ]
    _lib = lib
    return _lib


def native_decompress(data: bytes, n_atoms: int):
    """Native payload decompression; returns ``(coords, consumed,
    precision)`` or ``None`` when the library is unavailable or
    rejects the stream."""

    lib = load()
    if lib is None:
        return None
    out = np.empty((n_atoms, 3), dtype=np.float32)
    precision = ctypes.c_float(0.0)
    consumed = lib.xtc_decompress(
        data,
        len(data),
        n_atoms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(precision),
    )
    if consumed < 0:
        return None
    return out, int(consumed), float(precision.value)


def native_compress(coords: np.ndarray, precision: float):
    """Native payload compression; returns ``bytes`` or ``None``."""

    lib = load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    n_atoms = len(coords)
    # Worst case is ~102 bits/atom (3x32-bit coords + flag/run bits
    # on the wide-range path); 16 bytes/atom is a safe ceiling.
    cap = 16 * n_atoms + 1024
    out = np.empty(cap, dtype=np.uint8)
    written = lib.xtc_compress(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_atoms,
        ctypes.c_float(precision),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        cap,
    )
    if written < 0:
        return None
    return out[:written].tobytes()
