"""BPE subword generation (data/subword.py + cli/gen_subword.py) —
reference: av_hubert preparation gen_subword.py (spm vocab -> fairseq dict)."""

import os

from omni_avsr_tpu.data.subword import (
    BPEEncoder,
    SPECIALS,
    letter_dict,
    train_bpe,
    word_dict,
)

TEXTS = ["the cat sat on the mat", "the cat ran", "a mat on the cat"] * 20


def test_train_bpe_roundtrip():
    pieces, merges, counts = train_bpe(TEXTS, vocab_size=40)
    assert len(pieces) + 4 <= 40
    enc = BPEEncoder(pieces, merges)
    ids = enc.encode("the cat sat")
    assert all(i >= 4 for i in ids)  # no unks on in-domain text
    assert enc.decode(ids) == "the cat sat"
    # frequent whole words become single pieces
    assert "▁the" in pieces


def test_bpe_specials_layout():
    pieces, merges, _ = train_bpe(TEXTS, vocab_size=30)
    enc = BPEEncoder(pieces, merges)
    assert enc.symbols[:4] == SPECIALS
    assert (enc.bos, enc.pad, enc.eos, enc.unk) == (0, 1, 2, 3)
    # unseen characters hit <unk>
    assert enc.unk in enc.encode("zzzqqq")


def test_bpe_save_load(tmp_path):
    pieces, merges, _ = train_bpe(TEXTS, vocab_size=30)
    enc = BPEEncoder(pieces, merges)
    enc.save(str(tmp_path / "spm_bpe30"))
    enc2 = BPEEncoder.load(str(tmp_path / "spm_bpe30"))
    assert enc2.encode("the cat") == enc.encode("the cat")


def test_letter_and_word_dicts():
    ld = dict(letter_dict(TEXTS))
    assert "|" in ld and ld["t"] > 0
    wd = word_dict(TEXTS)
    assert wd[0][0] == "the"  # most frequent first


def test_gen_subword_cli_into_fairseq_dictionary(tmp_path):
    from omni_avsr_tpu.cli.eval_avhubert_s2s import FairseqDictionary
    from omni_avsr_tpu.cli.gen_subword import main

    manifest = tmp_path / "train.csv"
    manifest.write_text(
        "\n".join(f"lrs3,clip{i}.mp4,100,0,{t}" for i, t in enumerate(TEXTS)))
    main(["--input", str(manifest), "--output-dir", str(tmp_path / "spm"),
          "--model-type", "bpe", "--vocab-size", "40"])
    d = FairseqDictionary(str(tmp_path / "spm" / "dict.wrd.txt"))
    assert len(d) <= 40 and len(d) > 10
    assert d.symbols[:4] == SPECIALS

    enc = BPEEncoder.load(str(tmp_path / "spm" / "spm_bpe40"))
    # piece ids line up between the encoder and the fairseq dictionary
    for piece in enc.pieces[:5]:
        assert d.index[piece] == enc.index[piece]
