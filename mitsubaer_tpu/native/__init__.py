"""ctypes bindings for the native runtime library (mernative.cpp): fast
mmap-based OBJ parsing and VOL3 grid loading. Compiled on first use with g++;
falls back to the pure-Python parsers in utils/io.py when unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmernative.so")
_SRC = os.path.join(_DIR, "mernative.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.obj_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.obj_free.argtypes = [ctypes.c_void_p]
        lib.vol_header.restype = ctypes.c_int
        lib.vol_header.argtypes = [ctypes.c_char_p] + [ctypes.c_void_p] * 4
        lib.vol_read.restype = ctypes.c_int
        lib.vol_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        return _lib


def load_obj_native(path):
    """Fast OBJ parse; returns (verts (V,3) f32, tris (T,3) i32) or None."""
    lib = get_lib()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    h = lib.obj_parse(str(path).encode(), ctypes.byref(nv), ctypes.byref(nt))
    if not h or nv.value < 0:
        return None
    verts = np.empty((nv.value, 3), np.float32)
    tris = np.empty((nt.value, 3), np.int32)
    lib.obj_copy(h, verts.ctypes.data_as(ctypes.c_void_p),
                 tris.ctypes.data_as(ctypes.c_void_p))
    lib.obj_free(h)
    return verts, tris


def read_vol_native(path):
    """Fast VOL3 read; returns (data (nz,ny,nx,ch) f32, lo, hi) or None."""
    lib = get_lib()
    if lib is None:
        return None
    enc = np.zeros(1, np.int32)
    dims = np.zeros(3, np.int32)
    ch = np.zeros(1, np.int32)
    bbox = np.zeros(6, np.float32)
    rc = lib.vol_header(
        str(path).encode(),
        enc.ctypes.data_as(ctypes.c_void_p), dims.ctypes.data_as(ctypes.c_void_p),
        ch.ctypes.data_as(ctypes.c_void_p), bbox.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    n = int(dims[0]) * int(dims[1]) * int(dims[2]) * int(ch[0])
    out = np.empty(n, np.float32)
    rc = lib.vol_read(str(path).encode(), out.ctypes.data_as(ctypes.c_void_p), n)
    if rc != 0:
        return None
    data = out.reshape(int(dims[2]), int(dims[1]), int(dims[0]), int(ch[0]))
    return data, bbox[:3].copy(), bbox[3:].copy()
