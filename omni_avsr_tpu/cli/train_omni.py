"""Train driver for the unified Omni-AVSR model.

Equivalent of `train_OmniAVSR.py` (same flag names; see cli/common.py):
epoch loop with per-step random matryoshka rates, per-epoch validation +
checkpointing, post-training last-N weight averaging, and an auto-test
sweep over the task x rate grid (`train_OmniAVSR.py:400-479`).

Offline smoke run (synthetic corpus + tiny dims):
  python -m omni_avsr_tpu.cli.train_omni --synthetic 8 --max-epochs 2 \
      --exp-dir /tmp/omni_smoke
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ..config import TrainConfig
from ..data.datamodule import DataModule
from ..data.noise import load_noise_bank
from ..train.checkpoint import average_last_n, latest_checkpoint, restore_checkpoint, save_checkpoint
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
    p = argparse.ArgumentParser("train_omni")
    add_common_args(p)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=0.1)
    p.add_argument("--warmup-epochs", type=float, default=0.0)
    p.add_argument("--max-epochs", type=int, default=8)
    p.add_argument("--gradient-clip-val", type=float, default=10.0)
    p.add_argument("--num-check-save", type=int, default=4)
    p.add_argument("--num-average-epochs", type=int, default=4)
    p.add_argument("--ckpt-path", default=None, help="resume from this orbax checkpoint")
    p.add_argument("--auto-resume", type=str2bool, default=True,
                   help="resume from the latest checkpoint in exp-dir if present")
    p.add_argument("--auto-test", type=str2bool, default=True)
    p.add_argument("--wandb", type=str2bool, default=False)
    p.add_argument("--project-wandb", default="omni-avsr-tpu")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of the first train steps here")
    p.add_argument("--detect-nan", type=str2bool, default=False,
                   help="debug: scan step outputs/params for NaN/Inf")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    setup_distributed(args)  # before anything initializes the xla backend
    maybe_synthetic(args)
    # the unified Omni model trains all three tasks per batch and therefore
    # needs AV data (the reference's trainer is the same 3-task design,
    # `modeling_OmniAVSR.py:263-306`); single-task training is the
    # Llama-AVSR baseline driver
    assert args.modality == "audiovisual", (
        f"train_omni is the 3-task unified trainer (needs --modality "
        f"audiovisual, got {args.modality!r}); for single-task training use "
        f"omni_avsr_tpu.cli.train_llama_avsr"
    )
    os.makedirs(args.exp_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.exp_dir, args.exp_name, "checkpoints")

    model = build_model(args)
    params = build_params(args, model)
    mesh, feed, pipeline = setup_parallelism(args, params)
    data_cfg = build_data_config(args)
    dm = DataModule(data_cfg, model.tok, modality=args.modality)
    steps_per_epoch = max(dm.steps_per_epoch(), 1)

    train_cfg = TrainConfig(
        lr=args.lr, weight_decay=args.weight_decay,
        warmup_epochs=args.warmup_epochs, max_epochs=args.max_epochs,
        grad_clip=args.gradient_clip_val, seed=args.seed,
        num_checkpoints_to_average=args.num_average_epochs,
        checkpoint_dir=ckpt_dir,
    )
    noise = load_noise_bank(args.noise_path) if args.modality != "video" else None
    engine = OmniEngine(
        model, params, train_cfg, steps_per_epoch,
        unfrozen_modules=tuple(args.unfrozen_modules),
        noise_bank=noise, seed=args.seed, pipeline=pipeline,
    )
    logger = MetricLogger(
        args.exp_dir, args.exp_name,
        use_wandb=args.wandb, project=args.project_wandb, config=vars(args),
    )

    start_epoch = 0
    resume_path = args.ckpt_path or (latest_checkpoint(ckpt_dir) if args.auto_resume else None)
    if resume_path:
        engine.state = restore_checkpoint(resume_path, engine.state)
        start_epoch = int(engine.state.step) // steps_per_epoch
        print(f"resumed from {resume_path} at epoch {start_epoch}")

    from ..utils.profiling import StepTimer, find_nonfinite, trace

    from ..parallel.distributed import is_primary

    timer = StepTimer()
    for epoch in range(start_epoch, args.max_epochs):
        t0 = time.time()
        n, loss_sum, loss_n = 0, 0.0, 0
        from ..utils.prefetch import device_prefetch

        batches = (map(feed, dm.train_batches(epoch)) if mesh is not None
                   else device_prefetch(dm.train_batches(epoch)))
        for batch in batches:
            with trace(args.profile_dir if (epoch == start_epoch and 2 <= n <= 4) else None):
                loss = engine.train_step(batch)
            timer.tick()
            n += 1
            if n % 10 == 0 or n == 1:
                loss_val = float(loss)  # sync point
                loss_sum += loss_val
                loss_n += 1
                if args.detect_nan and loss_val != loss_val:
                    bad = find_nonfinite(engine.state.trainable)
                    raise FloatingPointError(f"NaN loss at step {engine.state.step}; "
                                             f"non-finite params: {bad[:10]}")
                logger.log(int(engine.state.step), {
                    "train_loss": loss_val,
                    "lr": float(engine.schedule(int(engine.state.step))),
                    "step_time_s": timer.mean,
                })
        train_loss = loss_sum / max(loss_n, 1)

        # validation (reference logs loss_val + per-task, `lightning:185-190`)
        val_n, val_sum = 0, 0.0
        for batch in dm.val_batches():
            total, _ = engine.eval_step(feed(batch) if mesh is not None else batch)
            val_sum += float(total)
            val_n += 1
        val_loss = val_sum / max(val_n, 1)
        dt = time.time() - t0
        if is_primary():
            print(f"epoch {epoch}: train_loss={train_loss:.4f} val_loss={val_loss:.4f} "
                  f"steps={n} ({dt:.1f}s)")
            logger.log(int(engine.state.step), {"epoch": epoch, "loss_val": val_loss})
            # multi-host: gather the (replicated) state to host numpy first so
            # the primary-only orbax save never waits on a cross-host barrier
            ckpt_state = (jax.tree_util.tree_map(np.asarray, engine.state)
                          if mesh is not None else engine.state)
            save_checkpoint(ckpt_dir, int(engine.state.step), ckpt_state,
                            keep=args.num_check_save)

    # post-training weight averaging (`utils/avg_checkpoints.py:34-44`);
    # saved OUTSIDE ckpt_dir so --auto-resume never resumes from averaged
    # weights with stale optimizer moments. Multi-host: primary only (the
    # checkpoints live on the primary's disk); other hosts are done.
    if not is_primary():
        return
    template = (jax.tree_util.tree_map(np.asarray, engine.state)
                if mesh is not None else engine.state)
    avg = average_last_n(ckpt_dir, template, min(args.num_average_epochs, args.max_epochs))
    engine.state = engine.state._replace(
        trainable=jax.tree_util.tree_map(lambda x: jax.numpy.asarray(x), avg)
    )
    avg_dir = os.path.join(args.exp_dir, args.exp_name,
                           f"model_avg_{args.num_average_epochs}")
    save_checkpoint(avg_dir, int(engine.state.step),
                    template._replace(trainable=avg), keep=0)
    print(f"averaged last {args.num_average_epochs} checkpoints -> {avg_dir}")

    if args.auto_test and args.test_file:
        if jax.process_count() > 1:
            print("auto-test skipped under multi-host training — run "
                  "cli/eval_omni on one host against the averaged checkpoint")
        else:
            run_auto_test(args, model, engine, dm, logger)
    logger.close()


def run_auto_test(args, model, engine, dm, logger) -> None:
    """Task x rate WER sweep (`train_OmniAVSR.py:426-478`; VSR 3x per rate)."""
    params = engine.merged_params()
    results = {}
    tasks = [("audio", [(ra, None) for ra in model.cfg.audio_rates]),
             ("video", [(None, rv) for rv in model.cfg.video_rates]),
             ("audiovisual", [(ra, rv) for ra in model.cfg.audio_rates
                              for rv in model.cfg.video_rates])]
    for task, rate_grid in tasks:
        if args.modality not in ("audiovisual", task):
            continue
        for ra, rv in rate_grid:
            reps = 3 if task == "video" else 1  # VSR tested 3x (`:441-445`)
            for rep in range(reps):
                acc = WerAccumulator()
                dm_task = type(dm)(dm.cfg, dm.tok, modality=task)
                for batch in dm_task.test_batches():
                    hyps = engine.decode_batch(params, batch, task, ra, rv)
                    for ref, hyp in zip(batch["gold_text"], hyps):
                        acc.update(ref, hyp)
                key = f"wer/{task}_a{ra}_v{rv}" + (f"_rep{rep}" if reps > 1 else "")
                results[key] = acc.wer
                print(f"{key}: {acc.wer:.4f}")
    logger.log(int(engine.state.step), results)


if __name__ == "__main__":
    main()
