"""WER + BLEU scorers (native C++ path and Python fallback)."""

import math

import numpy as np

from omni_avsr_tpu.utils.metrics import BleuScorer, WerAccumulator
from omni_avsr_tpu.utils.native import bleu_stats_native


def test_wer_basic():
    acc = WerAccumulator()
    acc.update("the cat sat", "the cat sat")
    assert acc.wer == 0.0
    acc.update("the cat sat", "the bat sat down")
    # 1 sub + 1 ins over 6 ref words total
    assert acc.total_edit_distance == 2 and acc.total_length == 6


def test_bleu_perfect_match():
    b = BleuScorer()
    b.update("the quick brown fox jumps", "the quick brown fox jumps")
    assert abs(b.score() - 100.0) < 1e-9
    assert b.brevity_penalty == 1.0


def test_bleu_known_value():
    """Hand-computed clipped-count corpus BLEU."""
    b = BleuScorer()
    # ref: a b c d e f ; hyp: a b c d x f
    # 1-gram: 5/6, 2-gram: 3/5, 3-gram: 2/4 (abc bcd), 4-gram: 1/3 (abcd)
    b.update("a b c d e f", "a b c d x f")
    expected = math.exp((math.log(5 / 6) + math.log(3 / 5)
                         + math.log(2 / 4) + math.log(1 / 3)) / 4) * 100
    assert abs(b.score() - expected) < 1e-9
    assert b.stats.tolist() == [6, 6, 5, 6, 3, 5, 2, 4, 1, 3]


def test_bleu_clipping_and_brevity():
    b = BleuScorer()
    # hyp repeats "the" 4x; ref has it twice -> clipped 1-gram match = 2
    b.update("the cat the dog", "the the the the")
    assert b.stats[2] == 2 and b.stats[3] == 4
    assert b.score() == 0.0  # no 2-gram matches
    # brevity: hyp shorter than ref
    b2 = BleuScorer()
    b2.update("a b c d", "a b")
    assert abs(b2.brevity_penalty - math.exp(1 - 4 / 2)) < 1e-12


def test_bleu_native_matches_python_fallback():
    rs = np.random.RandomState(0)
    for _ in range(20):
        ref = rs.randint(0, 8, rs.randint(1, 15)).tolist()
        hyp = rs.randint(0, 8, rs.randint(1, 15)).tolist()
        s_native = np.zeros(10, np.int64)
        bleu_stats_native(ref, hyp, s_native)  # C++ when toolchain present

        # independent pure-python clipped counting
        s_py = np.zeros(10, np.int64)
        from collections import Counter

        s_py[0], s_py[1] = len(ref), len(hyp)
        for k in range(1, 5):
            if len(hyp) - k + 1 <= 0:
                continue
            refc = Counter(tuple(ref[i:i + k]) for i in range(len(ref) - k + 1))
            hypc = Counter(tuple(hyp[i:i + k]) for i in range(len(hyp) - k + 1))
            s_py[2 + 2 * (k - 1)] = sum(min(c, refc[g]) for g, c in hypc.items())
            s_py[3 + 2 * (k - 1)] = len(hyp) - k + 1
        assert s_native.tolist() == s_py.tolist(), (ref, hyp)


def test_bleu_batch_accumulates():
    b = BleuScorer()
    b.update_ids([1, 2, 3], [1, 2, 3])
    b.update_ids([4, 5], [4, 9])
    assert b.stats[0] == 5 and b.stats[1] == 5
    assert b.stats[2] == 3 + 1  # 1-gram matches
    assert "BLEU4" in b.result_string()
