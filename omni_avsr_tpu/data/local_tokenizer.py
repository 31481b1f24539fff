"""Build a real (fast, byte-level BPE) tokenizer fully offline.

Purpose: the environment has no network, so the actual Llama/Qwen tokenizer
files are unreachable. But `transformers` + `tokenizers` are installed, so we
can train a miniature byte-level BPE tokenizer locally that exercises the SAME
HF fast-tokenizer machinery (TemplateProcessing post-processor, added special
tokens, padding) the reference manipulates in
`Omni_AVSR/lightning_OmniAVSR.py:53-91`. That lets us pin
`data/tokenizer.py::load_hf_tokenizer` token-for-token against the reference's
construction without the real checkpoint files.

The tokenizer is Llama-3-shaped (byte-level BPE, `<|begin_of_text|>` /
`<|end_of_text|>`, no pad token) or Qwen-2.5-shaped (`<|endoftext|>` as both
eos and pad, no bos) depending on `family`.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

_DEFAULT_CORPUS = [
    "set your course by the stars not by the lights of passing ships",
    "the quick brown fox jumps over the lazy dog",
    "transcribe speech to text",
    "transcribe video to text",
    "transcribe speech and video to text",
    "hello world this is a tiny corpus for a tiny tokenizer",
    "numbers 0 1 2 3 4 5 6 7 8 9 punctuation , . ! ? ' -",
]


def build_local_bpe_tokenizer(
    out_dir: str,
    family: str = "llama",
    vocab_size: int = 384,
    corpus: Optional[Iterable[str]] = None,
):
    """Train a tiny byte-level BPE tokenizer and save it HF-loadable.

    Returns the directory path, which `transformers.AutoTokenizer
    .from_pretrained` accepts. The saved tokenizer mirrors the *pristine*
    upstream state (before the reference's surgery): Llama ships with a bos
    and eos but NO pad token and NO AV delimiter specials; Qwen ships with
    `<|endoftext|>` as eos+pad and no bos (`lightning_OmniAVSR.py:54-91`).
    """
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    if family == "llama":
        bos, eos = "<|begin_of_text|>", "<|end_of_text|>"
        specials = [bos, eos]
    elif family == "qwen":
        bos, eos = None, "<|endoftext|>"
        specials = [eos]
    else:
        raise ValueError(f"unknown family {family!r}")

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=specials,
        # full byte alphabet so ANY unicode input round-trips
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(list(corpus or _DEFAULT_CORPUS), trainer)

    kwargs = dict(eos_token=eos)
    if bos is not None:
        kwargs["bos_token"] = bos
    else:
        # Qwen2.5 ships pad = <|endoftext|> in tokenizer_config
        kwargs["pad_token"] = eos
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, **kwargs)
    os.makedirs(out_dir, exist_ok=True)
    fast.save_pretrained(out_dir)
    return out_dir
