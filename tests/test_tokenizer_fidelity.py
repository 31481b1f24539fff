"""Real-tokenizer fidelity: pin `load_hf_tokenizer` against the reference's
actual tokenizer construction, token-id for token-id, using a locally-built
fast BPE tokenizer (no network needed).

Reference construction being mirrored here (executed through the SAME
transformers/tokenizers APIs the reference calls):
  - `Omni_AVSR/lightning_OmniAVSR.py:53-91` — AutoTokenizer(add_bos_token=
    not-qwen, add_eos_token=True); TemplateProcessing override
    "<bos> $A <eos>" (llama) / "$A <eos>" (qwen); added specials
    `<pad>` (llama only) + `<audio></audio><video></video>`; padding right.
  - `datamodule/data_module.py:46-67` — collator tokenizes with
    padding='longest'; labels mask `<pad>`; test-mode tokens = bare
    `vocab["<|begin_of_text|>"]` (llama) / empty (qwen).
  - `Omni_AVSR/modeling_OmniAVSR.py:217-220` — prompt buffers =
    `tokenizer(prompt).input_ids[:, start:-1]`, start = 0 (qwen) / 1 (llama).
"""

from __future__ import annotations

import numpy as np
import pytest

from omni_avsr_tpu.data.local_tokenizer import build_local_bpe_tokenizer
from omni_avsr_tpu.data.tokenizer import (
    AUDIO_EOS,
    AUDIO_SOS,
    DEFAULT_PAD,
    VIDEO_EOS,
    VIDEO_SOS,
    load_hf_tokenizer,
)

# Adversarial strings per the round-3 verdict: empty, specials-in-text,
# long words, unicode, odd whitespace/case/punctuation.
ADVERSARIAL = [
    "",
    "hello world",
    "  leading and trailing  ",
    "transcribe speech to text.",
    "<audio>injected</audio> and <video>more</video> and <pad>",
    "llanfairpwllgwyngyllgogerychwyrndrobwllllantysiliogogogoch",
    "UPPER lower MiXeD CaSe",
    "punct!? ... -- 'quoted' (parens)",
    "héllo wörld ñ 你好",
    "a",
    "1234567890",
]

PROMPTS = [
    "Transcribe speech to text.",  # train_OmniAVSR.py:136-151 defaults
    "Transcribe video to text.",
    "Transcribe speech and video to text.",
]


def _reference_construction(path: str, family: str):
    """Execute the reference's tokenizer surgery verbatim-in-semantics
    (lightning_OmniAVSR.py:53-91) on a local tokenizer dir."""
    from tokenizers.processors import TemplateProcessing
    from transformers import AutoTokenizer

    is_qwen = family == "qwen"
    tok = AutoTokenizer.from_pretrained(
        path, add_bos_token=not is_qwen, add_eos_token=True
    )
    if not is_qwen:
        bos, eos = tok.bos_token, tok.eos_token
        tok._tokenizer.post_processor = TemplateProcessing(
            single=f"{bos}:0 $A:0 {eos}:0",
            pair=f"{bos}:0 $A:0 {eos}:0 {bos}:1 $B:1 {eos}:1",
            special_tokens=[(bos, tok.bos_token_id), (eos, tok.eos_token_id)],
        )
        tok.add_special_tokens(
            {
                "pad_token": DEFAULT_PAD,
                "additional_special_tokens": [AUDIO_SOS, AUDIO_EOS, VIDEO_SOS, VIDEO_EOS],
            }
        )
    else:
        eos = tok.eos_token
        tok._tokenizer.post_processor = TemplateProcessing(
            single=f"$A:0 {eos}:0",
            pair=f"$A:0 {eos}:0 $B:1 {eos}:1",
            special_tokens=[(eos, tok.eos_token_id)],
        )
        tok.add_special_tokens(
            {"additional_special_tokens": [AUDIO_SOS, AUDIO_EOS, VIDEO_SOS, VIDEO_EOS]}
        )
    tok.padding_side = "right"
    return tok


@pytest.fixture(scope="module", params=["llama", "qwen"])
def pair(request, tmp_path_factory):
    family = request.param
    # load_hf_tokenizer keys family off "Qwen" in the model string
    name = "Qwen2.5-0.5B-local" if family == "qwen" else "Llama-3.2-1B-local"
    path = str(tmp_path_factory.mktemp("tok") / name)
    build_local_bpe_tokenizer(path, family=family)
    ref = _reference_construction(path, family)
    ours = load_hf_tokenizer(path)
    return family, ref, ours


def test_special_token_ids_and_vocab(pair):
    family, ref, ours = pair
    assert ours.vocab_size == len(ref)
    assert ours.eos_id == ref.eos_token_id
    for tok_str, our_id in [
        (AUDIO_SOS, ours.audio_sos_id),
        (AUDIO_EOS, ours.audio_eos_id),
        (VIDEO_SOS, ours.video_sos_id),
        (VIDEO_EOS, ours.video_eos_id),
    ]:
        assert our_id == ref.convert_tokens_to_ids(tok_str)
    if family == "llama":
        assert ours.bos_id == ref.bos_token_id
        # reference collator: pad_id = convert_tokens_to_ids('<pad>')
        assert ours.pad_id == ref.convert_tokens_to_ids(DEFAULT_PAD)
    else:
        assert ours.bos_id is None
        # qwen pads with its own pad token (= eos, per Qwen tokenizer_config)
        assert ours.pad_id == ref.pad_token_id == ref.eos_token_id


def test_encode_ids_match_reference(pair):
    family, ref, ours = pair
    for s in ADVERSARIAL:
        ref_ids = ref(s).input_ids
        assert ours.encode(s) == ref_ids, (
            f"family={family} text={s!r}: ours={ours.encode(s)} ref={ref_ids}"
        )


def test_batch_padding_matches_reference(pair):
    """Reference collator: tokenizer(texts, padding='longest') →
    [template-processed row][pad]*; ours: encode rows + right-pad with
    pad_id. Rows must be elementwise identical (data_module.py:56-67)."""
    family, ref, ours = pair
    texts = ["hello world", "a", "transcribe speech to text."]
    ref_mat = ref(texts, padding="longest").input_ids  # list of lists
    rows = [ours.encode(t) for t in texts]
    t_max = max(len(r) for r in rows)
    our_mat = np.full((len(rows), t_max), ours.pad_id, np.int32)
    for i, r in enumerate(rows):
        our_mat[i, : len(r)] = r
    assert our_mat.tolist() == [list(r) for r in ref_mat]


def test_prompt_ids_slice_matches_reference(pair):
    """modeling_OmniAVSR.py:217-220: prompt ids = input_ids[:, start:-1]."""
    family, ref, ours = pair
    start = 0 if family == "qwen" else 1
    for p in PROMPTS:
        ref_slice = ref(p).input_ids[start:-1]
        assert ours.prompt_ids(p).tolist() == ref_slice


def test_test_mode_bos_matches_vocab_lookup(pair):
    """data_module.py:54: test tokens = vocab['<|begin_of_text|>'] (llama)."""
    family, ref, ours = pair
    if family == "llama":
        assert ours.bos_id == ref.vocab["<|begin_of_text|>"]


def test_decode_matches_skip_special_tokens(pair):
    family, ref, ours = pair
    for s in ["hello world", "transcribe speech to text.", "punct!? -- 'q'"]:
        ids = ref(s).input_ids
        assert ours.decode(ids) == ref.decode(ids, skip_special_tokens=True)


def test_qwen_label_mask_quirk_documented(pair):
    """Reference quirk (data_module.py:21,60): for qwen,
    convert_tokens_to_ids('<pad>') returns the unk/None sentinel, so label
    positions padded with <|endoftext|> are NEVER masked to -100 — qwen
    training loss includes pad positions as eos targets. We deliberately
    mask pads for both families (data/batching.py) since labels are unused
    at inference and masking is the correct loss; recorded in PARITY.md."""
    family, ref, ours = pair
    if family == "qwen":
        pad_probe = ref.convert_tokens_to_ids(DEFAULT_PAD)
        assert pad_probe is None or pad_probe == ref.unk_token_id
