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
            lib.balanced_assignment.restype = ctypes.c_int64
            lib.balanced_assignment.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.token_block_slices.restype = ctypes.c_int64
            lib.token_block_slices.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.block_to_dataset_index.restype = None
            lib.block_to_dataset_index.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
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


def balanced_assignment_native(scores: np.ndarray) -> np.ndarray:
    """Balanced linear assignment: give each of W workers exactly J/W jobs,
    maximising total score (auction algorithm, fairseq libbase
    `balanced_assignment.cpp` semantics — BASE-layer MoE routing).

    scores: float [num_jobs, num_workers]. Returns int64[num_jobs] where
    positions w*k .. w*k+k-1 hold the jobs assigned to worker w.
    """
    scores = np.ascontiguousarray(scores, np.float32)
    num_jobs, num_workers = scores.shape
    if num_jobs % num_workers:
        raise ValueError(f"{num_workers} workers do not divide {num_jobs} jobs")
    lib = _load()
    if lib is None:
        return _balanced_assignment_py(scores)
    out = np.empty(num_jobs, np.int64)
    rc = lib.balanced_assignment(
        _ptr(scores, ctypes.c_float), num_jobs, num_workers,
        _ptr(out, ctypes.c_int64))
    if rc != 0:
        raise RuntimeError("balanced_assignment failed")
    return out


def _balanced_assignment_py(scores: np.ndarray) -> np.ndarray:
    """Pure-numpy auction fallback (same iteration structure as the C++)."""
    num_jobs, num_workers = scores.shape
    k = num_jobs // num_workers
    max_iterations = 100
    eps = max((scores.max() - scores.min()) / 50.0, 1e-4)
    base = scores.T.astype(np.float64).copy()  # [W, J]
    value = base.copy()
    cost = np.zeros(num_jobs)
    retained = np.zeros(0, np.int64)
    counter = 0
    while True:
        bids = np.zeros_like(base)
        # descending top-(k+1) with index tiebreak = np.argsort on (-value)
        top_index = np.argsort(-value, axis=1, kind="stable")[:, : k + 1]
        top_values = np.take_along_axis(value, top_index, axis=1)
        incr = top_values[:, :k] - top_values[:, k:] + eps
        np.put_along_axis(bids, top_index[:, :k], incr, axis=1)
        if 0 < counter < max_iterations:
            bids.reshape(-1)[retained] = eps
        high_bids = bids.max(axis=0)
        high_bidders = bids.argmax(axis=0)
        have = high_bids > 0
        if have.all():
            break
        cost += high_bids
        value = base - cost[None, :]
        retained = (high_bidders * num_jobs + np.arange(num_jobs))[have]
        value.reshape(-1)[retained] = (
            base.max() if counter < max_iterations
            else base.reshape(-1)[retained])
        counter += 1
    return top_index[:, :k].reshape(-1).astype(np.int64)


_BLOCK_MODES = {"none": 0, None: 0, "complete": 1, "complete_doc": 2, "eos": 3}


def token_block_slices_native(
    sizes: List[int], break_mode: Optional[str], block_size: int,
    document_sep_len: int = 1,
) -> np.ndarray:
    """Chop per-sentence token sizes into contiguous (start, end) blocks —
    fairseq `token_block_utils_fast.pyx::_get_slice_indices_fast` semantics.
    Returns int64 [num_blocks, 2]."""
    if break_mode not in _BLOCK_MODES:
        raise ValueError(f"Invalid break_mode: {break_mode}")
    mode = _BLOCK_MODES[break_mode]
    ls = np.ascontiguousarray(sizes, np.int64)
    n = len(ls)
    lib = _load()
    if lib is None:
        return _token_block_slices_py(ls, mode, block_size, document_sep_len)
    total = int(ls.sum())
    max_blocks = max(1, (total + block_size - 1) // block_size if mode == 0 else n)
    out = np.zeros(2 * max_blocks, np.int64)
    m = int(lib.token_block_slices(
        _ptr(ls, ctypes.c_int64), n, mode, block_size, document_sep_len,
        _ptr(out, ctypes.c_int64)))
    if m < 0:
        raise ValueError(f"Invalid break_mode: {break_mode}")
    return out[: 2 * m].reshape(m, 2)


def _token_block_slices_py(ls, mode, block_size, document_sep_len):
    total = int(ls.sum())
    blocks = []
    if mode == 0:
        length = -(-total // block_size)
        blocks = [(i * block_size, min((i + 1) * block_size, total))
                  for i in range(length)]
    elif mode in (1, 2):
        tok = cur = sz = 0
        n = len(ls)
        while sz < n:
            fits = cur + ls[sz] <= block_size or cur == 0
            is_sep = mode == 2 and ls[sz] == document_sep_len
            if fits and not is_sep:
                cur += int(ls[sz]); sz += 1
            else:
                if cur > (0 if mode == 1 else 1):
                    blocks.append((tok, tok + cur))
                tok += cur; cur = 0
                if is_sep:
                    tok += int(ls[sz]); sz += 1
        if cur > (0 if mode == 1 else 1):
            blocks.append((tok, tok + cur))
    else:
        tok = 0
        for s in ls:
            blocks.append((tok, tok + int(s)))
            tok += int(s)
    return np.asarray(blocks, np.int64).reshape(len(blocks), 2)


def block_to_dataset_index_native(
    sizes: List[int], slices: np.ndarray) -> np.ndarray:
    """Map token (start, end) slices to (start_sentence, start_offset,
    end_sentence) dataset coordinates — `_get_block_to_dataset_index_fast`
    semantics. Returns int64 [num_blocks, 3]."""
    ls = np.ascontiguousarray(sizes, np.int64)
    sl = np.ascontiguousarray(slices, np.int64)
    m = sl.shape[0]
    lib = _load()
    if lib is None:
        cum = np.concatenate([[0], np.cumsum(ls)])
        out = np.zeros((m, 3), np.int64)
        for i, (s, e) in enumerate(sl):
            a = int(np.searchsorted(cum, s, side="right") - 1)
            b = int(np.searchsorted(cum, max(s, e - 1), side="right") - 1)
            out[i] = (a, s - cum[a], b)
        return out
    out = np.zeros(3 * m, np.int64)
    lib.block_to_dataset_index(
        _ptr(ls, ctypes.c_int64), len(ls),
        _ptr(sl.reshape(-1), ctypes.c_int64), m,
        _ptr(out, ctypes.c_int64))
    return out.reshape(m, 3)
