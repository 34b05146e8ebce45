"""ctypes bindings for the native (C++) parser/levelizer.

The reference's compiler layer is C++ (src/analyze.cpp, src/assemble.cpp);
liboece_native.so is our native equivalent for the O(G) hot paths.  The
Python implementations in bristol.py / netlist.py define the behavior; the
native versions are bit-identical accelerations and are used automatically
when the library is present (built lazily with ``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liboece_native.so")
_lib = None


def _load(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.oece_parse_bristol.restype = ctypes.c_void_p
    lib.oece_parse_bristol.argtypes = [ctypes.c_char_p]
    lib.oece_parse_error.restype = ctypes.c_char_p
    lib.oece_parse_error.argtypes = [ctypes.c_void_p]
    for fn in ("oece_parse_n_gates", "oece_parse_n_wires"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ("oece_parse_n_inputs", "oece_parse_n_outputs"):
        getattr(lib, fn).restype = ctypes.c_int32
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.oece_parse_io_bits.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.oece_parse_gates.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.oece_parse_free.argtypes = [ctypes.c_void_p]
    lib.oece_levelize.argtypes = [ctypes.c_void_p] * 4 + [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_bristol_native(path: str, name: Optional[str] = None):
    """Native Bristol parse -> Netlist, or None if unavailable/failed."""
    from .netlist import Netlist

    lib = _load()
    if lib is None:
        return None
    h = lib.oece_parse_bristol(path.encode())
    try:
        err = lib.oece_parse_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        G = lib.oece_parse_n_gates(h)
        n_wires = lib.oece_parse_n_wires(h)
        ni = lib.oece_parse_n_inputs(h)
        no = lib.oece_parse_n_outputs(h)
        in_bits = np.zeros(ni, dtype=np.int32)
        out_bits = np.zeros(no, dtype=np.int32)
        lib.oece_parse_io_bits(
            h, in_bits.ctypes.data_as(ctypes.c_void_p), out_bits.ctypes.data_as(ctypes.c_void_p)
        )
        op = np.empty(G, dtype=np.int32)
        in0 = np.empty(G, dtype=np.int32)
        in1 = np.empty(G, dtype=np.int32)
        out = np.empty(G, dtype=np.int32)
        lib.oece_parse_gates(
            h,
            *(a.ctypes.data_as(ctypes.c_void_p) for a in (op, in0, in1, out)),
        )
    finally:
        lib.oece_parse_free(h)

    inputs: List[np.ndarray] = []
    off = 0
    for b in in_bits:
        inputs.append(np.arange(off, off + int(b), dtype=np.int32))
        off += int(b)
    outputs: List[np.ndarray] = []
    off = int(n_wires) - int(out_bits.sum())
    for b in out_bits:
        outputs.append(np.arange(off, off + int(b), dtype=np.int32))
        off += int(b)
    return Netlist(
        name=name or os.path.splitext(os.path.basename(path))[0],
        n_wires=int(n_wires),
        inputs=inputs,
        outputs=outputs,
        op=op,
        in0=in0,
        in1=in1,
        out=out,
    )


def levelize_native(nl) -> Optional[tuple]:
    """Native ASAP levelization -> (glevel, grank) int64 arrays, or None."""
    lib = _load()
    if lib is None:
        return None
    G = nl.n_gates
    glevel = np.empty(G, dtype=np.int64)
    grank = np.empty(G, dtype=np.int64)
    lib.oece_levelize(
        nl.op.ctypes.data_as(ctypes.c_void_p),
        nl.in0.ctypes.data_as(ctypes.c_void_p),
        nl.in1.ctypes.data_as(ctypes.c_void_p),
        nl.out.ctypes.data_as(ctypes.c_void_p),
        G,
        nl.n_wires,
        glevel.ctypes.data_as(ctypes.c_void_p),
        grank.ctypes.data_as(ctypes.c_void_p),
    )
    return glevel, grank
