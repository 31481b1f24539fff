"""Fine-tune AV-HuBERT with a CTC or seq2seq head (original AV-HuBERT
recipes, `av_hubert/avhubert/hubert_asr.py` + fairseq trainer).

Character-level targets are built from the manifest transcripts (fairseq
letter-dictionary style: words split into letters + '|' boundaries).

Offline smoke:
  python -m omni_avsr_tpu.cli.train_avhubert_s2s --synthetic 4 \
      --head s2s --max-epochs 1 --exp-dir /tmp/s2s_smoke
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AVHubertConfig, DataConfig, TrainConfig
from ..data.datamodule import DataModule
from ..data.tokenizer import TokenizerBundle
from ..models.avhubert import avhubert_encode, init_avhubert
from ..models.avhubert_s2s import (
    S2SDecoderConfig,
    ctc_loss,
    init_ctc_head,
    init_s2s_decoder,
    s2s_cross_entropy,
    s2s_decoder_forward,
    s2s_greedy_decode,
)
from ..ops.augment import video_pipeline
from ..utils.metrics import WerAccumulator
from .common import str2bool


class LetterDictionary:
    """fairseq-style letter dictionary: <s> <pad> </s> <unk> then letters."""

    def __init__(self):
        letters = list("abcdefghijklmnopqrstuvwxyz'") + ["|"]
        self.symbols = ["<s>", "<pad>", "</s>", "<unk>"] + letters
        self.index = {s: i for i, s in enumerate(self.symbols)}
        self.bos, self.pad, self.eos, self.unk = 0, 1, 2, 3

    def encode(self, text: str) -> List[int]:
        out = []
        for w in text.lower().split():
            for ch in w:
                out.append(self.index.get(ch, self.unk))
            out.append(self.index["|"])
        return out

    def decode(self, ids: List[int]) -> str:
        chars = [self.symbols[i] for i in ids
                 if i not in (self.bos, self.pad, self.eos)]
        return "".join(chars).replace("|", " ").strip()

    def __len__(self):
        return len(self.symbols)


def tok_stub(d: LetterDictionary) -> TokenizerBundle:
    return TokenizerBundle(
        family="llama", vocab_size=len(d), bos_id=d.bos, eos_id=d.eos,
        pad_id=d.pad, audio_sos_id=0, audio_eos_id=0, video_sos_id=0,
        video_eos_id=0, _encode_plain=lambda t: d.encode(t),
        _decode=lambda ids: d.decode(ids),
    )


def main(argv=None):
    p = argparse.ArgumentParser("train_avhubert_s2s")
    p.add_argument("--exp-dir", default="./exp_s2s")
    p.add_argument("--head", default="s2s", choices=["s2s", "ctc"])
    p.add_argument("--modality", default="video", choices=["video", "audiovisual"])
    p.add_argument("--root-dir", default="")
    p.add_argument("--train-file", default="")
    p.add_argument("--test-file", default="")
    p.add_argument("--pretrain-avhubert-path", default=None)
    p.add_argument("--freeze-encoder", type=str2bool, default=False)
    p.add_argument("--decoder-layers", type=int, default=6)
    p.add_argument("--decoder-embed-dim", type=int, default=768)
    p.add_argument("--decoder-ffn-dim", type=int, default=3072)
    p.add_argument("--decoder-heads", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-epochs", type=int, default=1)
    p.add_argument("--max-frames", type=int, default=1000)
    p.add_argument("--max-dec-len", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--tiny", type=str2bool, default=False)
    args = p.parse_args(argv)

    if args.synthetic:
        from ..data.synthetic import generate_corpus

        out_dir = os.path.join(args.exp_dir, "synthetic_data")
        os.makedirs(out_dir, exist_ok=True)
        train_csv, _, test_csv = generate_corpus(out_dir, n_train=args.synthetic)
        args.root_dir, args.train_file, args.test_file = out_dir, train_csv, test_csv
        args.tiny = True

    d = LetterDictionary()
    if args.tiny:
        enc_cfg = AVHubertConfig(
            encoder_embed_dim=48, encoder_layers=2, encoder_heads=4,
            encoder_ffn_dim=96, audio_feat_dim=104, lora_rank_divisor=None,
        )
        dec_cfg = S2SDecoderConfig(
            vocab_size=len(d), pad_id=d.pad, eos_id=d.eos, embed_dim=32,
            ffn_dim=64, layers=2, heads=4, encoder_dim=48,
        )
    else:
        from ..config import avhubert_large

        enc_cfg = avhubert_large(use_lora=False)
        dec_cfg = S2SDecoderConfig(
            vocab_size=len(d), pad_id=d.pad, eos_id=d.eos,
            embed_dim=args.decoder_embed_dim, ffn_dim=args.decoder_ffn_dim,
            layers=args.decoder_layers, heads=args.decoder_heads,
            encoder_dim=enc_cfg.encoder_embed_dim,
        )

    rng = jax.random.PRNGKey(args.seed)
    k_enc, k_dec = jax.random.split(rng)
    if args.pretrain_avhubert_path:
        from ..convert.avhubert_torch import convert_avhubert
        from ..convert.omni_ckpt import load_torch_checkpoint

        enc_params = convert_avhubert(
            load_torch_checkpoint(args.pretrain_avhubert_path), enc_cfg,
            dtype=jnp.float32,
        )
    else:
        enc_params = init_avhubert(k_enc, enc_cfg)
    head_params = (
        init_s2s_decoder(k_dec, dec_cfg) if args.head == "s2s"
        else init_ctc_head(k_dec, enc_cfg.encoder_embed_dim, len(d))
    )

    params = {"enc": enc_params, "head": head_params}
    import optax

    from ..train.optim import warmup_cosine_schedule

    schedule = warmup_cosine_schedule(args.lr, 0.0, args.max_epochs, 100)
    # with --freeze-encoder the encoder must be excluded from AdamW's
    # decoupled weight decay too (zeroed grads alone don't stop decay)
    wd_mask = jax.tree_util.tree_map(lambda _: True, params)
    if args.freeze_encoder:
        wd_mask = {"enc": jax.tree_util.tree_map(lambda _: False, params["enc"]),
                   "head": jax.tree_util.tree_map(lambda _: True, params["head"])}
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(schedule, b1=0.9, b2=0.98, weight_decay=0.1, mask=wd_mask),
    )
    opt_state = tx.init(params)

    def make_targets(texts: List[str], T: int) -> Tuple[np.ndarray, np.ndarray]:
        rows = [d.encode(t)[: T - 1] for t in texts]
        tgt = np.full((len(rows), T), d.pad, np.int32)
        lens = np.zeros(len(rows), np.int32)
        for i, r in enumerate(rows):
            seq = r + [d.eos]
            tgt[i, : len(seq)] = seq
            lens[i] = len(seq)
        return tgt, lens

    @jax.jit
    def train_step(params, opt_state, video, audio_feats, video_len, tgt, tgt_len, key):
        # audio_feats: (B, T, 104) stacked fbanks for --modality audiovisual,
        # None for video-only (None is static under jit)
        def loss_fn(params):
            v = video_pipeline(key, video, video_len, train=True)
            enc = avhubert_encode(params["enc"], enc_cfg, v, audio=audio_feats,
                                  lengths=video_len)
            if args.head == "s2s":
                # teacher forcing: prev = [eos] + tgt[:-1] (fairseq convention)
                prev = jnp.concatenate(
                    [jnp.full((tgt.shape[0], 1), d.eos, jnp.int32), tgt[:, :-1]], axis=1
                )
                logits = s2s_decoder_forward(params["head"], dec_cfg, prev, enc, video_len)
                return s2s_cross_entropy(logits, tgt, d.pad)
            return ctc_loss(params["head"], enc, video_len, tgt, tgt_len, blank_id=d.bos)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if args.freeze_encoder:
            grads = {**grads, "enc": jax.tree_util.tree_map(jnp.zeros_like, grads["enc"])}
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    from ..data.audio_features import batch_stacked_fbank
    from ..data.batching import CollateConfig, bucket_batches, collate
    from ..data.dataset import AVDataset

    ds = AVDataset(args.root_dir, args.train_file, args.modality)
    tok = tok_stub(d)
    global_step = 0
    for epoch in range(args.max_epochs):
        t0 = time.time()
        losses = []
        for batch_idx in bucket_batches(ds.input_lengths, args.max_frames, 10,
                                        shuffle=True, seed=epoch):
            samples = [ds[i] for i in batch_idx]
            b = collate(samples, tok, CollateConfig(modality=args.modality))
            texts = [s["text"] for s in samples]
            T = b["video"].shape[1]
            tgt, tgt_len = make_targets(texts, min(args.max_dec_len, T))
            afeats = (jnp.asarray(batch_stacked_fbank(b["audio"], b["audio_len"], T))
                      if args.modality == "audiovisual" else None)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(b["video"]), afeats,
                jnp.asarray(b["video_len"]), jnp.asarray(tgt),
                jnp.asarray(tgt_len), jax.random.fold_in(rng, global_step),
            )
            global_step += 1
            losses.append(float(loss))
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} ({time.time()-t0:.1f}s)")

    # greedy WER over the test manifest (s2s head)
    if args.test_file and args.head == "s2s":
        ds_t = AVDataset(args.root_dir, args.test_file, args.modality)
        acc = WerAccumulator()

        @jax.jit
        def decode_fn(video, audio_feats, video_len):
            v = video_pipeline(None, video, video_len, train=False)
            enc = avhubert_encode(params["enc"], enc_cfg, v, audio=audio_feats,
                                  lengths=video_len)
            return s2s_greedy_decode(params["head"], dec_cfg, enc, video_len,
                                     args.max_dec_len)

        for i in range(len(ds_t)):
            s = ds_t[i]
            b = collate([s], tok, CollateConfig(modality=args.modality,
                                                is_trainval=False))
            afeats = (jnp.asarray(batch_stacked_fbank(
                b["audio"], b["audio_len"], b["video"].shape[1]))
                if args.modality == "audiovisual" else None)
            ids = np.asarray(decode_fn(jnp.asarray(b["video"]), afeats,
                                       jnp.asarray(b["video_len"])))[0]
            toks = [int(t) for t in ids]
            if d.eos in toks:
                toks = toks[: toks.index(d.eos)]
            acc.update(s["text"], d.decode(toks))
        print(f"WER: {acc.wer:.4f} ({acc.total_edit_distance}/{acc.total_length})")


if __name__ == "__main__":
    main()
