"""Train driver for the Llama-AVSR / Llama-MTSK baselines.

Equivalent of `train_LlamaAVSR.py`: single-task model (one prompt, non-task-
specific LoRA); with --is-matryoshka the loss is the mean over ALL trained
rates each step (Llama-MTSK, `modeling_LlamaAVSR.py:244-251`), unlike Omni's
sampled rate. Reloads the averaged checkpoint before auto-test
(`train_LlamaAVSR.py:402-403`).

Offline smoke:
  python -m omni_avsr_tpu.cli.train_llama_avsr --synthetic 6 --max-epochs 1 \
      --modality audio --exp-dir /tmp/llama_avsr_smoke
"""

from __future__ import annotations

import argparse
import os
import time

import jax

from ..config import TrainConfig
from ..data.datamodule import DataModule
from ..data.noise import load_noise_bank
from ..train.checkpoint import average_last_n, restore_checkpoint, save_checkpoint
from ..train.engine import OmniEngine
from ..utils.logging import MetricLogger
from ..utils.metrics import WerAccumulator
from .common import (
    add_common_args,
    build_data_config,
    build_model,
    build_params,
    maybe_synthetic,
    setup_distributed,
    setup_parallelism,
    str2bool,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_llama_avsr")
    add_common_args(p)
    p.add_argument("--prompt", default="Transcribe speech to text.",
                   help="the baseline's single prompt")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=0.1)
    p.add_argument("--warmup-epochs", type=float, default=0.0)
    p.add_argument("--max-epochs", type=int, default=8)
    p.add_argument("--gradient-clip-val", type=float, default=10.0)
    p.add_argument("--num-check-save", type=int, default=4)
    p.add_argument("--num-average-epochs", type=int, default=4)
    p.add_argument("--ckpt-path", default=None)
    p.add_argument("--auto-test", type=str2bool, default=True)
    p.add_argument("--wandb", type=str2bool, default=False)
    p.add_argument("--project-wandb", default="omni-avsr-tpu")
    args = p.parse_args(argv)
    # baseline: single prompt everywhere, modality-agnostic LoRA
    args.prompt_audio = args.prompt_video = args.prompt_audiovisual = args.prompt
    args.is_task_specific = False
    args.use_shared_lora_task_specific = False
    return args


def main(argv=None):
    args = parse_args(argv)
    setup_distributed(args)  # before anything initializes the xla backend
    maybe_synthetic(args)
    os.makedirs(args.exp_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.exp_dir, args.exp_name, "checkpoints")

    model = build_model(args)
    params = build_params(args, model)
    mesh, feed, pipeline = setup_parallelism(args, params)
    data_cfg = build_data_config(args)
    dm = DataModule(data_cfg, model.tok, modality=args.modality,
                    downsample_video=(None if args.is_matryoshka
                                      else model.cfg.video_rates[0]))
    steps_per_epoch = max(dm.steps_per_epoch(), 1)

    train_cfg = TrainConfig(
        lr=args.lr, weight_decay=args.weight_decay,
        warmup_epochs=args.warmup_epochs, max_epochs=args.max_epochs,
        grad_clip=args.gradient_clip_val, seed=args.seed, checkpoint_dir=ckpt_dir,
    )
    unfrozen = tuple(m for m in args.unfrozen_modules if m != "lora_avhubert"
                     or args.modality != "audio")
    noise = load_noise_bank(args.noise_path) if args.modality != "video" else None
    engine = OmniEngine(model, params, train_cfg, steps_per_epoch,
                        unfrozen_modules=unfrozen, noise_bank=noise, seed=args.seed,
                        pipeline=pipeline)
    logger = MetricLogger(args.exp_dir, args.exp_name, use_wandb=args.wandb,
                          project=args.project_wandb, config=vars(args))

    start_epoch = 0
    if args.ckpt_path:
        engine.state = restore_checkpoint(args.ckpt_path, engine.state)
        start_epoch = int(engine.state.step) // steps_per_epoch

    for epoch in range(start_epoch, args.max_epochs):
        t0 = time.time()
        n, loss_sum, loss_n = 0, 0.0, 0
        for batch in dm.train_batches(epoch):
            loss = engine.single_train_step(
                feed(batch) if mesh is not None else batch, args.modality)
            n += 1
            if n % 10 == 0 or n == 1:
                loss_sum += float(loss)
                loss_n += 1
                logger.log(int(engine.state.step), {"loss": float(loss)})
        val_sum, val_n = 0.0, 0
        for batch in dm.val_batches():
            val_sum += float(engine.single_eval_step(
                feed(batch) if mesh is not None else batch, args.modality))
            val_n += 1
        print(f"epoch {epoch}: loss={loss_sum / max(loss_n, 1):.4f} "
              f"loss_val={val_sum / max(val_n, 1):.4f} steps={n} "
              f"({time.time() - t0:.1f}s)")
        logger.log(int(engine.state.step),
                   {"epoch": epoch, "loss_val": val_sum / max(val_n, 1)})
        save_checkpoint(ckpt_dir, int(engine.state.step), engine.state,
                        keep=args.num_check_save)

    avg = average_last_n(ckpt_dir, engine.state,
                         min(args.num_average_epochs, args.max_epochs))
    engine.state = engine.state._replace(
        trainable=jax.tree_util.tree_map(jax.numpy.asarray, avg))
    avg_dir = os.path.join(args.exp_dir, args.exp_name,
                           f"model_avg_{args.num_average_epochs}")
    save_checkpoint(avg_dir, int(engine.state.step), engine.state, keep=0)
    print(f"averaged last {args.num_average_epochs} checkpoints -> {avg_dir}")

    if args.auto_test and args.test_file:
        params = engine.merged_params()
        dm_t = DataModule(data_cfg, model.tok, modality=args.modality)
        grid = engine._rate_combos(args.modality)
        for ra, rv in grid:
            acc = WerAccumulator()
            for batch in dm_t.test_batches():
                hyps = engine.decode_batch(params, batch, args.modality, ra, rv)
                for ref, hyp in zip(batch["gold_text"], hyps):
                    acc.update(ref, hyp)
            print(f"wer/{args.modality}_a{ra}_v{rv}: {acc.wer:.4f}")
            logger.log(int(engine.state.step), {f"wer_a{ra}_v{rv}": acc.wer})
    logger.close()


if __name__ == "__main__":
    main()
