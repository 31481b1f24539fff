"""Tokenizer layer: HF tokenizer wrapper with the reference's template fixes,
plus a synthetic tokenizer for offline tests.

Reference behaviour being reproduced (`Omni_AVSR/lightning_OmniAVSR.py:53-91`):
  - Llama: TemplateProcessing "<bos> $A <eos>" (works around HF's missing
    EOS append), added special tokens <pad>, <audio>, </audio>, <video>,
    </video>; pad token added because Llama has none.
  - Qwen: "$A <eos>" (no BOS), same four AV delimiters, pad = <|endoftext|>.
  - padding side right.
Prompt embeddings use input_ids[:, 1:-1] (llama, strip BOS+EOS) or [:-1]
(qwen, strip EOS) — `modeling_OmniAVSR.py:218-229`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

AUDIO_SOS, AUDIO_EOS = "<audio>", "</audio>"
VIDEO_SOS, VIDEO_EOS = "<video>", "</video>"
DEFAULT_PAD = "<pad>"

IGNORE_INDEX = -100


@dataclass
class TokenizerBundle:
    """Uniform host-side tokenizer interface used by models/data/decode."""

    family: str  # "llama" | "qwen"
    vocab_size: int
    bos_id: Optional[int]
    eos_id: int
    pad_id: int
    audio_sos_id: int
    audio_eos_id: int
    video_sos_id: int
    video_eos_id: int
    _encode_plain: callable  # text -> ids WITHOUT specials
    _decode: callable  # ids -> text

    def encode(self, text: str) -> List[int]:
        """With template: llama [bos]+ids+[eos]; qwen ids+[eos]."""
        ids = list(self._encode_plain(text))
        if self.family == "llama":
            return [self.bos_id] + ids + [self.eos_id]
        return ids + [self.eos_id]

    def prompt_ids(self, prompt: str) -> np.ndarray:
        """The slice the reference embeds as the prompt buffer."""
        ids = self.encode(prompt)
        start = 1 if self.family == "llama" else 0
        return np.asarray(ids[start:-1], dtype=np.int32)

    def decode(self, ids: Sequence[int]) -> str:
        specials = {
            self.bos_id, self.eos_id, self.pad_id,
            self.audio_sos_id, self.audio_eos_id,
            self.video_sos_id, self.video_eos_id,
        }
        return self._decode([i for i in ids if i not in specials])


def load_hf_tokenizer(llm_model: str) -> TokenizerBundle:
    """Wrap an HF tokenizer (requires local HF cache / files)."""
    from transformers import AutoTokenizer

    family = "qwen" if "Qwen" in llm_model else "llama"
    tok = AutoTokenizer.from_pretrained(llm_model)
    if family == "llama":
        tok.add_special_tokens({
            "pad_token": DEFAULT_PAD,
            "additional_special_tokens": [AUDIO_SOS, AUDIO_EOS, VIDEO_SOS, VIDEO_EOS],
        })
        pad_id = tok.convert_tokens_to_ids(DEFAULT_PAD)
        bos_id = tok.bos_token_id
    else:
        tok.add_special_tokens({
            "additional_special_tokens": [AUDIO_SOS, AUDIO_EOS, VIDEO_SOS, VIDEO_EOS],
        })
        pad_id = tok.eos_token_id
        bos_id = None
    tok.padding_side = "right"

    def encode_plain(text: str) -> List[int]:
        return tok(text, add_special_tokens=False).input_ids

    return TokenizerBundle(
        family=family,
        vocab_size=len(tok),
        bos_id=bos_id,
        eos_id=tok.eos_token_id,
        pad_id=pad_id,
        audio_sos_id=tok.convert_tokens_to_ids(AUDIO_SOS),
        audio_eos_id=tok.convert_tokens_to_ids(AUDIO_EOS),
        video_sos_id=tok.convert_tokens_to_ids(VIDEO_SOS),
        video_eos_id=tok.convert_tokens_to_ids(VIDEO_EOS),
        _encode_plain=encode_plain,
        _decode=lambda ids: tok.decode(ids, skip_special_tokens=True),
    )


def synthetic_tokenizer(family: str = "llama", base_vocab: int = 247) -> TokenizerBundle:
    """Offline word-hash tokenizer for tests and synthetic end-to-end runs.
    Deterministic, round-trips lowercase word sequences."""
    # reserve the top ids for specials, like resize_token_embeddings
    specials = ["<bos>", "<eos>", DEFAULT_PAD, AUDIO_SOS, AUDIO_EOS, VIDEO_SOS, VIDEO_EOS]
    vocab_size = base_vocab + len(specials)
    sid = {s: base_vocab + i for i, s in enumerate(specials)}
    # simple invertible mapping is impossible with hashing; keep a dict
    word_to_id: dict = {}
    id_to_word: dict = {}

    def encode_plain(text: str) -> List[int]:
        ids = []
        for w in text.strip().split():
            if w not in word_to_id:
                nid = len(word_to_id) % base_vocab
                # collision-tolerant: words map into [0, base_vocab)
                word_to_id[w] = nid
                id_to_word.setdefault(nid, w)
            ids.append(word_to_id[w])
        return ids

    def decode(ids: Sequence[int]) -> str:
        return " ".join(id_to_word.get(i, f"<unk{i}>") for i in ids)

    return TokenizerBundle(
        family=family,
        vocab_size=vocab_size,
        bos_id=sid["<bos>"] if family == "llama" else None,
        eos_id=sid["<eos>"],
        pad_id=sid[DEFAULT_PAD] if family == "llama" else sid["<eos>"],
        audio_sos_id=sid[AUDIO_SOS],
        audio_eos_id=sid[AUDIO_EOS],
        video_sos_id=sid[VIDEO_SOS],
        video_eos_id=sid[VIDEO_EOS],
        _encode_plain=encode_plain,
        _decode=decode,
    )
