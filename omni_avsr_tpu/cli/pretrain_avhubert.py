"""AV-HuBERT masked-prediction pre-training driver.

Closes the unit-discovery -> pre-training loop: consumes `.km` unit labels
from cli/cluster_units.py and trains the encoder with the masked-prediction
criterion (models/avhubert_pretrain.py). Equivalent of the fairseq
`av_hubert_pretraining` task + AVHubertCriterion training loop.

Offline smoke:
  python -m omni_avsr_tpu.cli.pretrain_avhubert --synthetic 4 \
      --max-steps 8 --exp-dir /tmp/pretrain_smoke
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AVHubertConfig, TrainConfig
from ..models.avhubert import avhubert_extract_features, init_avhubert
from ..models.avhubert_pretrain import avhubert_pretrain_loss, init_pretrain_head
from ..models.common import linear
from ..models.resnet3d import resnet3d_forward
from ..ops.augment import pretrain_video_pipeline
from ..train.optim import make_optimizer
from .common import str2bool


def labels_rate(labels_dir: str) -> int:
    """Unit-label frame rate: 100 Hz for MFCC units (iteration 1), 25 Hz for
    AV-HuBERT layer features (iterations 2-5). cluster_units records it."""
    path = os.path.join(labels_dir, "label_rate.txt")
    if os.path.exists(path):
        return int(open(path).read().strip())
    return 100


def load_unit_labels(labels_dir: str, name: str, T: int, n_units: int,
                     rate: int = 100) -> np.ndarray:
    path = os.path.join(labels_dir, name + ".km")
    if os.path.exists(path):
        ids = np.asarray(open(path).read().split(), np.int32)
        # video frames are 25 Hz; subsample 100 Hz (MFCC) unit labels 4:1
        step = max(rate // 25, 1)
        ids = ids[::step][:T]
    else:
        ids = np.zeros(0, np.int32)
    out = np.zeros(T, np.int32)
    out[: len(ids)] = ids[:T]
    return np.clip(out, 0, n_units - 1)


def main(argv=None):
    p = argparse.ArgumentParser("pretrain_avhubert")
    p.add_argument("--exp-dir", default="./exp_pretrain")
    p.add_argument("--root-dir", default="")
    p.add_argument("--train-file", default="")
    p.add_argument("--labels-dir", default=None, help="cluster_units output")
    p.add_argument("--n-units", type=int, default=100)
    p.add_argument("--mask-prob", type=float, default=0.8)
    p.add_argument("--mask-length", type=int, default=10)
    p.add_argument("--modality-dropout", type=float, default=0.5)
    p.add_argument("--audio-dropout", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--max-steps", type=int, default=100)
    p.add_argument("--max-frames", type=int, default=500)
    p.add_argument("--final-dim", type=int, default=256)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--tiny", type=str2bool, default=False)
    args = p.parse_args(argv)

    if args.synthetic:
        from ..data.synthetic import generate_corpus

        out_dir = os.path.join(args.exp_dir, "synthetic_data")
        os.makedirs(out_dir, exist_ok=True)
        train_csv, _, _ = generate_corpus(out_dir, n_train=args.synthetic)
        args.root_dir, args.train_file = out_dir, train_csv
        args.tiny = True
        args.n_units = 8

    if args.tiny:
        cfg = AVHubertConfig(
            encoder_embed_dim=48, encoder_layers=2, encoder_heads=4,
            encoder_ffn_dim=96, audio_feat_dim=104, lora_rank_divisor=None,
        )
        args.final_dim = 16
    else:
        from ..config import avhubert_large

        cfg = avhubert_large(use_lora=False)

    rng = jax.random.PRNGKey(args.seed)
    k_enc, k_head = jax.random.split(rng)
    params = {
        "enc": init_avhubert(k_enc, cfg),
        "head": init_pretrain_head(k_head, cfg, args.n_units, args.final_dim),
    }
    tx, _ = make_optimizer(TrainConfig(lr=args.lr, max_epochs=1), args.max_steps)
    opt_state = tx.init(params)

    from ..data.audio_features import stacked_fbank as audio_fbank_stub

    @jax.jit
    def step(params, opt_state, video, audio_feats, targets, lengths, key):
        def loss_fn(params):
            kv, kp = jax.random.split(key)
            # pretraining aug = crop + flip ONLY (`hubert_dataset.py:216-220`),
            # not the fine-tune pipeline's AdaptiveTimeMask
            v = pretrain_video_pipeline(kv, video, train=True)
            vf = resnet3d_forward(params["enc"]["video_frontend"], v)
            vfeat = linear(vf, params["enc"]["video_proj"])
            afeat = linear(audio_feats, params["enc"]["audio_proj"])
            return avhubert_pretrain_loss(
                params["enc"], params["head"], cfg, vfeat, afeat, targets,
                lengths, kp, mask_prob=args.mask_prob,
                mask_length=args.mask_length,
                modality_dropout=args.modality_dropout,
                audio_dropout=args.audio_dropout,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    from ..data.batching import CollateConfig, bucket_batches, collate
    from ..data.dataset import AVDataset
    from ..data.tokenizer import synthetic_tokenizer

    ds = AVDataset(args.root_dir, args.train_file, "audiovisual")
    tok = synthetic_tokenizer()
    unit_rate = labels_rate(args.labels_dir) if args.labels_dir else 100
    n_steps, t0 = 0, time.time()
    while n_steps < args.max_steps:
        for batch_idx in bucket_batches(ds.input_lengths, args.max_frames, 4,
                                        shuffle=True, seed=n_steps):
            samples = [ds[i] for i in batch_idx]
            b = collate(samples, tok, CollateConfig(modality="audiovisual"))
            T = b["video"].shape[1]
            names = [os.path.splitext(os.path.basename(
                ds.entries[i].rel_path))[0] for i in batch_idx]
            if args.labels_dir:
                tgt = np.stack([load_unit_labels(args.labels_dir, nm, T,
                                                 args.n_units, unit_rate)
                                for nm in names])
            else:  # derive quick targets from audio (demo/smoke path)
                padded = b["audio"]  # (B, T*640)
                tgt = np.clip(
                    (np.abs(padded).reshape(len(samples), T, 640).mean(-1)
                     * args.n_units * 10).astype(np.int32),
                    0, args.n_units - 1,
                )
            afeats = np.stack([audio_fbank_stub(b["audio"][i], T)
                               for i in range(len(samples))])
            params, opt_state, loss, aux = step(
                params, opt_state, jnp.asarray(b["video"]), jnp.asarray(afeats),
                jnp.asarray(tgt), jnp.asarray(b["video_len"]),
                jax.random.fold_in(rng, n_steps),
            )
            n_steps += 1
            if n_steps % 5 == 0 or n_steps == 1:
                print(f"step {n_steps}: loss={float(loss):.4f} "
                      f"acc_m={float(aux['acc_masked']):.3f}")
            if n_steps >= args.max_steps:
                break
    # persist the encoder so clustering iterations 2-5 can dump its layer
    # features (`clustering/dump_hubert_feature.py` loop) — cluster_units
    # consumes this directory via --ckpt
    import json

    from ..config import asdict
    from ..train.checkpoint import save_checkpoint

    ckpt_path = save_checkpoint(
        os.path.join(args.exp_dir, "checkpoints"), n_steps, params)
    with open(os.path.join(args.exp_dir, "config.json"), "w") as f:
        json.dump({"avhubert": asdict(cfg), "n_units": args.n_units,
                   "final_dim": args.final_dim}, f, indent=2)
    print(f"done {n_steps} steps in {time.time() - t0:.1f}s; saved {ckpt_path}")
    return params


if __name__ == "__main__":
    main()
