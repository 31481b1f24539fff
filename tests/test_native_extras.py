"""Native balanced_assignment + token-block utils.

Behaviour specs:
  - fairseq `clib/libbase/balanced_assignment.cpp` (auction algorithm, k
    jobs per worker — BASE-layer MoE routing).
  - fairseq `data/token_block_utils_fast.pyx` (`_get_slice_indices_fast`,
    `_get_block_to_dataset_index_fast`).
Both have pure-Python fallbacks; the C++ path and the fallback are pinned
against each other and against brute force.
"""

import itertools

import numpy as np
import pytest

from omni_avsr_tpu.utils import native


def _brute_force_best(scores: np.ndarray) -> float:
    """Max total score over all balanced assignments (tiny instances)."""
    num_jobs, num_workers = scores.shape
    k = num_jobs // num_workers
    best = -np.inf
    for perm in itertools.permutations(range(num_jobs)):
        total = sum(scores[j, i // k] for i, j in enumerate(perm))
        best = max(best, total)
    return best


def _assert_valid(assignment: np.ndarray, num_jobs: int) -> None:
    assert assignment.shape == (num_jobs,)
    assert sorted(assignment.tolist()) == list(range(num_jobs))


def _total(scores: np.ndarray, assignment: np.ndarray) -> float:
    num_jobs, num_workers = scores.shape
    k = num_jobs // num_workers
    return sum(
        float(scores[j, w])
        for w in range(num_workers)
        for j in assignment[w * k:(w + 1) * k]
    )


@pytest.mark.parametrize("shape", [(6, 3), (8, 2), (4, 4)])
def test_balanced_assignment_near_optimal(shape):
    rng = np.random.RandomState(0)
    num_jobs, num_workers = shape
    scores = rng.randn(num_jobs, num_workers).astype(np.float32) * 3
    out = native.balanced_assignment_native(scores)
    _assert_valid(out, num_jobs)
    # Auction with bid increment eps is eps-suboptimal per job.
    eps = max((scores.max() - scores.min()) / 50.0, 1e-4)
    assert _total(scores, out) >= _brute_force_best(scores) - num_jobs * eps - 1e-5


def test_balanced_assignment_matches_python_fallback():
    rng = np.random.RandomState(7)
    for _ in range(5):
        scores = rng.randn(12, 4).astype(np.float32)
        a = native.balanced_assignment_native(scores)
        b = native._balanced_assignment_py(scores)
        _assert_valid(a, 12)
        _assert_valid(b, 12)
        # Same algorithm — identical totals (job→worker sets may tie-swap).
        assert abs(_total(scores, a) - _total(scores, b)) < 1e-4


def test_balanced_assignment_rejects_indivisible():
    with pytest.raises(ValueError):
        native.balanced_assignment_native(np.zeros((5, 2), np.float32))


def test_balanced_assignment_obvious_preferences():
    # Diagonal-dominant scores: worker w strongly prefers jobs 2w, 2w+1.
    num_workers, k = 4, 2
    num_jobs = num_workers * k
    scores = np.full((num_jobs, num_workers), -10.0, np.float32)
    for w in range(num_workers):
        scores[2 * w, w] = 10.0
        scores[2 * w + 1, w] = 10.0
    out = native.balanced_assignment_native(scores)
    _assert_valid(out, num_jobs)
    for w in range(num_workers):
        assert sorted(out[w * k:(w + 1) * k].tolist()) == [2 * w, 2 * w + 1]


# ---- token-block utils ----

def test_token_block_none_mode():
    sizes = [5, 3, 4]
    out = native.token_block_slices_native(sizes, "none", 4)
    assert out.tolist() == [[0, 4], [4, 8], [8, 12]]


def test_token_block_complete_mode():
    sizes = [3, 4, 5, 2]
    out = native.token_block_slices_native(sizes, "complete", 7)
    # pack [3,4] = 7; 5 alone would fit but 5+2=7 packs both
    assert out.tolist() == [[0, 7], [7, 14]]
    # a sentence longer than block_size still becomes its own block
    out = native.token_block_slices_native([10, 2], "complete", 4)
    assert out.tolist() == [[0, 10], [10, 12]]


def test_token_block_eos_mode():
    out = native.token_block_slices_native([2, 5, 1], "eos", 0)
    assert out.tolist() == [[0, 2], [2, 7], [7, 8]]


def test_token_block_complete_doc_mode():
    # doc-separator sentences (size == sep_len) break and are skipped;
    # size<=1 blocks are dropped.
    sizes = [3, 2, 1, 4, 1, 1]
    out = native.token_block_slices_native(
        sizes, "complete_doc", 6, document_sep_len=1)
    assert out.tolist() == [[0, 5], [6, 10]]


def test_token_block_invalid_mode():
    with pytest.raises(ValueError):
        native.token_block_slices_native([1], "bogus", 4)


@pytest.mark.parametrize("mode,block", [
    ("none", 4), ("none", 7), ("complete", 6), ("complete", 11),
    ("complete_doc", 8), ("eos", 0),
])
def test_token_block_native_matches_fallback(mode, block):
    rng = np.random.RandomState(3)
    sizes = rng.randint(1, 9, size=40).astype(np.int64)
    a = native.token_block_slices_native(sizes, mode, block)
    b = native._token_block_slices_py(
        sizes, native._BLOCK_MODES[mode], block, 1)
    np.testing.assert_array_equal(a, b)


def test_block_to_dataset_index():
    sizes = [4, 2, 6, 3]
    slices = native.token_block_slices_native(sizes, "none", 5)
    out = native.block_to_dataset_index_native(sizes, slices)
    # brute force via token→sentence map
    owner = np.repeat(np.arange(len(sizes)), sizes)
    starts = np.concatenate([[0], np.cumsum(sizes)])
    for (s, e), (a, off, b) in zip(slices.tolist(), out.tolist()):
        assert a == owner[s]
        assert off == s - starts[a]
        assert b == owner[e - 1]


def test_block_to_dataset_index_fallback_agrees():
    sizes = np.array([3, 1, 5, 2, 7, 1], np.int64)
    slices = native.token_block_slices_native(sizes, "none", 4)
    a = native.block_to_dataset_index_native(sizes, slices)
    # force the fallback path
    cum = np.concatenate([[0], np.cumsum(sizes)])
    b = np.zeros_like(a)
    for i, (s, e) in enumerate(slices):
        x = int(np.searchsorted(cum, s, side="right") - 1)
        y = int(np.searchsorted(cum, max(s, e - 1), side="right") - 1)
        b[i] = (x, s - cum[x], y)
    np.testing.assert_array_equal(a, b)
