"""ctypes bindings for the native host library (librle.so), built on demand
with make; every entry has a pure-numpy fallback in psalm_tpu.data.coco_rle."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "librle.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64 = ctypes.c_int64
    lib.rle_encode.restype = i64
    lib.rle_encode.argtypes = [u8p, i64, i64, u32p]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [u32p, i64, u8p, i64, i64]
    lib.rle_to_string.restype = i64
    lib.rle_to_string.argtypes = [u32p, i64, ctypes.c_char_p]
    lib.rle_from_string.restype = i64
    lib.rle_from_string.argtypes = [ctypes.c_char_p, i64, u32p]
    lib.mask_iou_matrix.restype = None
    lib.mask_iou_matrix.argtypes = [u8p, i64, u8p, i64, i64, u8p,
                                    ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def encode(mask: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    counts = np.empty(h * w + 1, np.uint32)
    n = lib.rle_encode(mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       h, w, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    counts = counts[:n]
    buf = ctypes.create_string_buffer(int(n) * 8)
    m = lib.rle_to_string(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                          n, buf)
    return {"size": [int(h), int(w)], "counts": buf.raw[:m]}


def decode(rle) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        s = counts.encode() if isinstance(counts, str) else counts
        out_counts = np.empty(h * w + 1, np.uint32)
        n = lib.rle_from_string(s, len(s), out_counts.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint32)))
        counts = out_counts[:n]
    else:
        counts = np.asarray(counts, np.uint32)
        n = len(counts)
    total = int(np.asarray(counts, np.uint64).sum())
    if total > h * w:
        raise ValueError(
            f"corrupt RLE: run total {total} exceeds size {h}x{w}")
    out = np.zeros((h, w), np.uint8)
    lib.rle_decode(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w)
    return out


def mask_iou_matrix(a: np.ndarray, b: np.ndarray,
                    iscrowd: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    P = len(a)
    G = len(b)
    if P == 0 or G == 0:
        return np.zeros((P, G))
    a = np.ascontiguousarray(a.reshape(P, -1), np.uint8)
    b = np.ascontiguousarray(b.reshape(G, -1), np.uint8)
    crowd = np.ascontiguousarray(
        iscrowd if iscrowd is not None else np.zeros(G), np.uint8)
    out = np.empty((P, G), np.float64)
    lib.mask_iou_matrix(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), P,
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), G, a.shape[1],
        crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
