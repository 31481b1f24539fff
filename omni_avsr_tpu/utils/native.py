"""ctypes bindings for the native C++ runtime library (native/editdist.cpp).

Builds on demand with g++ (cached in native/); every entry point has a pure
Python fallback so the framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_ROOT, "libomniavsr.so")
_SRC_PATH = os.path.join(_ROOT, "editdist.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC_PATH)
                and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.edit_distance_ids.restype = ctypes.c_int64
            lib.edit_distance_ids.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            lib.edit_distance_batch.restype = None
            lib.edit_distance_batch.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.bucket_pack.restype = ctypes.c_int64
            lib.bucket_pack.argtypes = [ctypes.POINTER(ctypes.c_int64)] * 2 + [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ] + [ctypes.POINTER(ctypes.c_int64)] * 2
            lib.bleu_add.restype = None
            lib.bleu_add.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def edit_distance_native(a: List[int], b: List[int]) -> int:
    lib = _load()
    aa = np.asarray(a, np.int32)
    bb = np.asarray(b, np.int32)
    if lib is None:
        return _edit_distance_py(aa, bb)
    return int(lib.edit_distance_ids(_ptr(aa, ctypes.c_int32), len(aa), _ptr(bb, ctypes.c_int32), len(bb)))


def _edit_distance_py(a: np.ndarray, b: np.ndarray) -> int:
    na, nb = len(a), len(b)
    if na == 0:
        return nb
    if nb == 0:
        return na
    prev = np.arange(nb + 1, dtype=np.int64)
    for i in range(1, na + 1):
        cur = np.empty(nb + 1, np.int64)
        cur[0] = i
        sub = prev[:-1] + (a[i - 1] != b)
        dele = prev[1:] + 1
        for j in range(1, nb + 1):
            cur[j] = min(sub[j - 1], dele[j - 1], cur[j - 1] + 1)
        prev = cur
    return int(prev[nb])


def bleu_stats_native(ref: List[int], hyp: List[int], stats: np.ndarray) -> None:
    """Accumulate clipped n-gram BLEU stats (orders 1-4) into stats[10]:
    [ref_len, hyp_len, match1, count1, ..., match4, count4]."""
    lib = _load()
    aa = np.asarray(ref, np.int32)
    bb = np.asarray(hyp, np.int32)
    if lib is not None:
        lib.bleu_add(_ptr(aa, ctypes.c_int32), len(aa),
                     _ptr(bb, ctypes.c_int32), len(bb),
                     _ptr(stats, ctypes.c_int64))
        return
    from collections import Counter

    stats[0] += len(aa)
    stats[1] += len(bb)
    for k in range(1, 5):
        if len(bb) - k + 1 <= 0:
            continue
        refc = Counter(tuple(aa[i:i + k]) for i in range(len(aa) - k + 1))
        hypc = Counter(tuple(bb[i:i + k]) for i in range(len(bb) - k + 1))
        match = sum(min(c, refc[g]) for g, c in hypc.items())
        stats[2 + 2 * (k - 1)] += match
        stats[3 + 2 * (k - 1)] += len(bb) - k + 1


def bucket_batches_native(
    lengths: List[int],
    max_frames: int,
    num_buckets: int,
    shuffle: bool,
    batch_size: int,
    seed: int,
) -> List[List[int]]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native lib unavailable")
    n = len(lengths)
    ls = np.asarray(lengths, np.int64)
    assert max_frames >= int(ls.max()), "max_frames < longest sample"
    if shuffle:
        order = np.random.RandomState(seed).permutation(n).astype(np.int64)
    else:
        order = np.argsort(-ls, kind="stable").astype(np.int64)
    starts = np.zeros(n + 1, np.int64)
    members = np.zeros(n, np.int64)
    nb = int(lib.bucket_pack(
        _ptr(ls, ctypes.c_int64), _ptr(order, ctypes.c_int64), n,
        max_frames, num_buckets, batch_size,
        _ptr(starts, ctypes.c_int64), _ptr(members, ctypes.c_int64),
    ))
    return [members[starts[i]:starts[i + 1]].tolist() for i in range(nb)]
