"""WER metric — word-level edit distance accumulator.

Parity with `lightning_OmniAVSR.py:40-42, 206-219`:
  distance = edit_distance(ref.lower().split(), hyp.lower().split())
  WER = sum(distance) / sum(len(ref.lower().split()))
Backed by the C++ edit-distance lib (native/editdist.cpp) with a Python
fallback.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

from .native import edit_distance_native


def _to_ids(words: List[str], vocab: Dict[str, int]) -> List[int]:
    return [vocab.setdefault(w, len(vocab)) for w in words]


def compute_word_level_distance(ref: str, hyp: str) -> int:
    vocab: Dict[str, int] = {}
    a = _to_ids(ref.lower().split(), vocab)
    b = _to_ids(hyp.lower().split(), vocab)
    return edit_distance_native(a, b)


@dataclass
class WerAccumulator:
    total_edit_distance: int = 0
    total_length: int = 0

    def update(self, ref: str, hyp: str) -> None:
        self.total_edit_distance += compute_word_level_distance(ref, hyp)
        self.total_length += len(ref.lower().split())

    @property
    def wer(self) -> float:
        if self.total_length == 0:
            return 0.0
        return self.total_edit_distance / self.total_length
