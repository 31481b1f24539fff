"""Scaled WER-neutrality probe for the decode fast paths (VERDICT r3 item 4).

Trains a deeper-than-smoke tiny Omni model on a >=32-clip synthetic corpus
until it fits the data, then decodes BOTH the memorized train split (the
contentful-transcript regime where quantization noise can actually flip
tokens) and the unseen test split at recipe-like settings — beam 15,
32 max tokens (`Omni_AVSR/modeling_OmniAVSR.py:312-322`) — across the full
task x matryoshka-rate grid, comparing:

  bf16    — baseline (reference-exact numerics)
  int8    — weight-only per-channel int8 (`ops/quant.py`), the bench default
  int4    — round-to-nearest int4 NUMERICS in an int8 container
            (`quantize_per_channel(bits=4)`) — the WER side of the int4
            study; the packed runtime is relay-blocked (PARITY.md)
  bucket  — bucketed Whisper window (`whisper_input_mode="bucket"`), the
            other bench default

Usage (ledger table):  python benchmarks/wer_probe.py [--clips 32] [--beams 15]
The slow test (tests/test_wer_probe_scaled.py) runs the same harness and
asserts int8/bucket WER-neutrality + transcript agreement.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import tempfile
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax


def build_probe_model(llm_layers: int = 4):
    """The smoke-test tiny model (cli/common.py::tiny_dims) deepened to
    `llm_layers` decoder layers, with the full 2x2 matryoshka rate grid."""
    from omni_avsr_tpu.cli.train_omni import parse_args
    from omni_avsr_tpu.cli.common import build_model
    from omni_avsr_tpu.models.omni import OmniAVSR

    args = parse_args([
        "--tiny", "true", "--exp-dir", "/tmp/unused",
        "--downsample-ratio-audio", "4", "8",
        "--downsample-ratio-video", "2", "3",
        "--is-matryoshka", "true",
    ])
    model = build_model(args)
    cfg = dataclasses.replace(
        model.cfg,
        llm=dataclasses.replace(model.cfg.llm, num_layers=llm_layers),
        # dropout floors the train CE at ~0.5 (≈60% token accuracy ->
        # word-level WER ~1.0 even "fitted") and layerdrop randomly skips
        # encoder layers (train/decode feature mismatch) — the probe needs
        # TRUE memorization, so ALL regularisation off (r4's recorded run
        # left layerdrop+augment on and never fitted; VERDICT r4 missing #2)
        avhubert=dataclasses.replace(
            model.cfg.avhubert, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, dropout_input=0.0, layerdrop=0.0),
    )
    return OmniAVSR(cfg, model.tok)


def rate_grid(model) -> List[Tuple[str, Optional[int], Optional[int]]]:
    """All three tasks x their matryoshka rates (cli/eval_omni.py grid)."""
    grid: List[Tuple[str, Optional[int], Optional[int]]] = []
    grid += [("audio", ra, None) for ra in model.cfg.audio_rates]
    grid += [("video", None, rv) for rv in model.cfg.video_rates]
    grid += [("audiovisual", ra, rv)
             for ra in model.cfg.audio_rates for rv in model.cfg.video_rates]
    return grid


def run_probe(
    exp_dir: Optional[str] = None,
    n_clips: int = 32,
    n_test: int = 8,
    epochs: int = 24,
    num_beams: int = 15,
    max_new: int = 32,
    lr: float = 6e-3,
    llm_layers: int = 4,
    batch_size: int = 8,
    seed: int = 0,
    target_loss: float = 0.02,
    verbose: bool = True,
    tasks: Optional[Tuple[str, ...]] = None,  # None = all three
    splits: Tuple[str, ...] = ("trainmem", "test"),
    max_settings: Optional[int] = None,  # truncate the task x rate grid
    max_settings_per_task: Optional[int] = None,  # e.g. 1 = one per task
) -> Dict:
    """Returns {"settings": {...}, "grid": {setting: {mode: {"wer", "agree",
    "hyps"}}}} — `agree` is token-for-token transcript agreement vs bf16."""
    from omni_avsr_tpu.config import DataConfig, TrainConfig
    from omni_avsr_tpu.data.datamodule import DataModule
    from omni_avsr_tpu.data.synthetic import generate_corpus
    from omni_avsr_tpu.models.omni import OmniAVSR
    from omni_avsr_tpu.ops.quant import quantize_decode_params
    from omni_avsr_tpu.train.engine import OmniEngine
    from omni_avsr_tpu.utils.metrics import WerAccumulator

    exp_dir = exp_dir or tempfile.mkdtemp(prefix="wer_probe_")
    data_dir = os.path.join(exp_dir, "synthetic_data")
    os.makedirs(data_dir, exist_ok=True)
    # COMPOSITIONAL corpus: per-word audio/video signatures laid out over
    # each word's time span (data/synthetic.py) — the transcript is locally
    # decodable from the features, so CE can actually reach ~0. Whole-clip
    # identity memorization does NOT fit (measured r5: the only training
    # signal for "which clip" is ln(n_clips) nats at the first content
    # token; CE pins at exactly ln(n)/tokens with trainable towers, aligned
    # batches and clip-distinct content — an optimization pathology, not a
    # bug). 8 words/clip -> fixed 48-frame clips -> one static trim per task.
    train_csv, val_csv, test_csv = generate_corpus(
        data_dir, n_train=n_clips, n_val=2, n_test=n_test,
        min_words=8, max_words=8, seed=seed, compositional=True,
    )

    model = build_probe_model(llm_layers)
    params = model.init_params(jax.random.PRNGKey(seed))

    def data_cfg(eval_file: str) -> DataConfig:
        return DataConfig(
            root_dir=data_dir, train_file=train_csv, val_file=val_csv,
            test_file=eval_file, max_frames_audiovisual=200,
            train_num_buckets=4, num_workers=2,
        )

    # full_llm + full_towers: LoRA-only training on RANDOM frozen towers
    # plateaus at loss ~4.2 (measured on-chip r3); full_llm alone plateaus
    # at CE ~= ln(n_clips)/tokens — the text memorizes but the model never
    # learns WHICH clip it is looking at (frozen random features are too
    # entangled for a 128-dim decoder to discriminate 32 ways; measured
    # on-chip r5: loss 0.33, trainmem WER 1.18, decode emits the wrong
    # clip's transcript). Trainable towers make the features discriminable
    # AND make the probe stronger: quantize_decode_params quantizes the
    # towers too, so their noise can now actually flip memorized outputs.
    # steps_per_epoch must be REAL so the cosine lr anneals within the run
    # (at constant 6e-3 the loss oscillates at ~0.5 and never memorizes).
    steps_per_epoch = max(n_clips // batch_size, 1)
    # augment=False: train on the EXACT eval-mode features the decoder will
    # see (center crop, no time masks / noise) — with random crops + masks on,
    # the mapping to memorize changes every step and the model never fits.
    # weight_decay MUST be 0 for the same reason (measured on-chip r5: at
    # the recipe's AdamW wd=0.1 the full-tower probe plateaus AT the
    # non-discrimination floor ~0.44 and drifts UP late in the run — the
    # decoupled decay shrinks every weight by lr*wd each step, erasing the
    # fine clip-signature features as fast as they form). warmup stabilises
    # the full-model (not LoRA-only) training at these lrs.
    engine = OmniEngine(model, params,
                        TrainConfig(lr=lr, max_epochs=epochs,
                                    weight_decay=0.0,
                                    warmup_epochs=max(epochs // 20, 1)),
                        float(steps_per_epoch), seed=seed,
                        unfrozen_modules=("peft_llm", "lora_avhubert",
                                          "full_llm", "full_towers"),
                        augment=False)
    dm_train = DataModule(data_cfg(train_csv), model.tok, modality="audiovisual")
    for ep in range(epochs):
        losses = []
        for batch in dm_train.train_batches(ep):
            losses.append(float(engine.train_step(batch)))
        mean_loss = sum(losses) / max(len(losses), 1)
        if verbose and (ep + 1) % 4 == 0:
            print(f"epoch {ep + 1}/{epochs} loss={mean_loss:.3f}", flush=True)
        if verbose and (ep + 1) % 40 == 0:
            # per-task CE on one batch — the aggregate hides which task lags
            for b in dm_train.train_batches(0):
                _, per = engine.eval_step(dict(b))
                print("  per-task: " + " ".join(
                    f"{k}={float(v):.3f}" for k, v in per.items()), flush=True)
                break
        # the probe is only meaningful in the MEMORIZED regime (contentful
        # transcripts a quantizer can actually disturb) — stop when fitted
        if mean_loss < target_loss:
            if verbose:
                print(f"fitted at epoch {ep + 1} (loss {mean_loss:.3f})",
                      flush=True)
            break

    if mean_loss > max(10 * target_loss, 0.2):
        # unfitted probes are uninterpretable (r4's recorded artifact; r5
        # measured: decode emits deterministic word salad) — don't burn the
        # decode grid, return the training evidence for diagnosis
        print(f"UNFITTED (loss {mean_loss:.3f} after {ep + 1} epochs) — "
              "skipping the decode grid", flush=True)
        return {
            "settings": {
                "n_clips": n_clips, "n_test": n_test, "epochs": epochs,
                "num_beams": num_beams, "max_new": max_new,
                "llm_layers": llm_layers, "seed": seed,
                "final_loss": mean_loss, "epochs_run": ep + 1,
                "unfitted": True,
            },
            "grid": {},
        }

    merged = engine.merged_params()
    trees = {
        "bf16": merged,
        "int8": quantize_decode_params(merged),
        "int4": quantize_decode_params(merged, bits=4),
    }
    # bucket mode: same weights through a bucketed-Whisper-window engine
    model_b = OmniAVSR(
        dataclasses.replace(model.cfg, whisper_input_mode="bucket"), model.tok)
    engine_b = OmniEngine(model_b, model_b.init_params(jax.random.PRNGKey(1)),
                          TrainConfig(), 1.0, seed=seed, inference_only=True)
    engines = {m: engine for m in trees} | {"bucket": engine_b}
    trees["bucket"] = merged

    results: Dict[str, Dict] = {}
    split_files = {"trainmem": train_csv, "test": test_csv}
    grid_settings = [g for g in rate_grid(model)
                     if tasks is None or g[0] in tasks]
    if max_settings_per_task is not None:
        seen: Dict[str, int] = {}
        kept = []
        for g in grid_settings:
            if seen.get(g[0], 0) < max_settings_per_task:
                kept.append(g)
                seen[g[0]] = seen.get(g[0], 0) + 1
        grid_settings = kept
    if max_settings is not None:
        grid_settings = grid_settings[:max_settings]
    for split_name in splits:
        eval_csv = split_files[split_name]
        for task, ra, rv in grid_settings:
            dm = DataModule(data_cfg(eval_csv), model.tok, modality=task)
            batches = list(dm.test_batches(batch_size))
            cell: Dict[str, Dict] = {}
            for mode in ("bf16", "int8", "int4", "bucket"):
                acc, hyps, refs = WerAccumulator(), [], []
                for batch in batches:
                    out = engines[mode].decode_batch(
                        trees[mode], dict(batch), task, ra, rv,
                        num_beams=num_beams, max_new=max_new)
                    hyps.extend(out)
                    refs.extend(batch["gold_text"])
                    for ref, hyp in zip(batch["gold_text"], out):
                        acc.update(ref, hyp)
                agree = float(np.mean(
                    [a == b for a, b in zip(cell["bf16"]["hyps"], hyps)])
                ) if mode != "bf16" else 1.0
                cell[mode] = {"wer": acc.wer, "agree": agree, "hyps": hyps}
            key = f"{split_name}/{task}(a={ra},v={rv})"
            results[key] = cell
            if verbose:
                row = " ".join(
                    f"{m}:wer={cell[m]['wer']:.3f},agr={cell[m]['agree']:.2f}"
                    for m in ("bf16", "int8", "int4", "bucket"))
                print(f"{key}: {row}", flush=True)

    return {
        "settings": {
            "n_clips": n_clips, "n_test": n_test, "epochs": epochs,
            "num_beams": num_beams, "max_new": max_new,
            "llm_layers": llm_layers, "seed": seed,
            "final_loss": mean_loss, "epochs_run": ep + 1,
        },
        "grid": results,
    }


def main(argv=None):
    p = argparse.ArgumentParser("wer_probe")
    p.add_argument("--clips", type=int, default=32)
    p.add_argument("--test-clips", type=int, default=8)
    p.add_argument("--epochs", type=int, default=400,
                   help="CAP — training early-stops at --target-loss "
                        "(the probe needs the memorized regime)")
    p.add_argument("--target-loss", type=float, default=0.02)
    p.add_argument("--beams", type=int, default=15)
    p.add_argument("--max-new", type=int, default=32)
    p.add_argument("--llm-layers", type=int, default=4)
    p.add_argument("--lr", type=float, default=6e-3)
    p.add_argument("--output-json", default=None)
    args = p.parse_args(argv)
    res = run_probe(n_clips=args.clips, n_test=args.test_clips,
                    epochs=args.epochs, num_beams=args.beams,
                    max_new=args.max_new, llm_layers=args.llm_layers,
                    lr=args.lr, target_loss=args.target_loss)
    if args.output_json:
        slim = {k: {m: {kk: vv for kk, vv in c[m].items() if kk != "hyps"}
                    for m in c} for k, c in res["grid"].items()}
        with open(args.output_json, "w") as f:
            json.dump({"settings": res["settings"], "grid": slim}, f, indent=1)
    return res


if __name__ == "__main__":
    main()
