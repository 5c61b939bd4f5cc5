"""ctypes bindings for the C++ host-path library (native/qrec_native.cpp).

Builds the shared library on first use if a compiler is available; every
entry point has a pure-Python/numpy fallback so the framework works without
a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "qrec_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "libqrec_native.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and os.path.exists(_SRC):
        if not _build():
            return None
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.qrec_parse_ratings.restype = ctypes.c_void_p
    lib.qrec_parse_ratings.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_int,
    ]
    for fn in ("qrec_parse_count", "qrec_parse_num_users",
               "qrec_parse_num_items", "qrec_parse_user_names_len",
               "qrec_parse_item_names_len"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.qrec_parse_copy.restype = None
    lib.qrec_parse_copy.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float32),
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.qrec_parse_free.restype = None
    lib.qrec_parse_free.argtypes = [ctypes.c_void_p]
    lib.qrec_random_walks.restype = None
    lib.qrec_random_walks.argtypes = [
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float64), ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_uint64,
        np.ctypeslib.ndpointer(np.int32),
    ]
    _LIB = lib
    return _LIB


def parse_ratings_native(
    path: str,
    u_col: int,
    i_col: int,
    r_col: int,
    binarize: bool = False,
    threshold: float = 3.0,
    skip_header: bool = False,
):
    """Fast tokenizing parser. Returns (users, items, ratings, user_names,
    item_names) with ids in first-appearance order, or None if the native
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.qrec_parse_ratings(
        path.encode(), u_col, i_col, r_col,
        1 if binarize else 0, threshold, 1 if skip_header else 0,
    )
    if not handle:
        return None
    try:
        n = lib.qrec_parse_count(handle)
        users = np.empty(n, dtype=np.int32)
        items = np.empty(n, dtype=np.int32)
        ratings = np.empty(n, dtype=np.float32)
        un = ctypes.create_string_buffer(lib.qrec_parse_user_names_len(handle))
        im = ctypes.create_string_buffer(lib.qrec_parse_item_names_len(handle))
        lib.qrec_parse_copy(handle, users, items, ratings, un, im)
        user_names = un.raw.decode().split("\n")[:-1]
        item_names = im.raw.decode().split("\n")[:-1]
        return users, items, ratings, user_names, item_names
    finally:
        lib.qrec_parse_free(handle)


def random_walks_native(
    net, walk_count: int, walk_length: int, seed: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ weighted random walks over a scipy CSR matrix; API-compatible
    with qrec_tpu.ops.walks.random_walks. Returns None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = net.indptr.astype(np.int32)
    deg = np.diff(indptr)
    active = np.where(deg > 0)[0].astype(np.int32)
    if len(active) == 0:
        return np.zeros((0, walk_length), dtype=np.int32), active
    cum = np.cumsum(net.data.astype(np.float64))
    starts = np.repeat(active, walk_count).astype(np.int32)
    walks = np.empty((len(starts), walk_length), dtype=np.int32)
    lib.qrec_random_walks(
        indptr, net.indices.astype(np.int32), cum, net.shape[0],
        starts, len(starts), walk_length, seed, walks,
    )
    return walks, active
