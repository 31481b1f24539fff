"""Eval driver for the unified Omni-AVSR model.

Equivalent of `eval_OmniAVSR.py:18-24, 259-357`: inference-only WER over the
matryoshka grid, or a specific task/rate via `--test-specific-ratio`,
`--test-specific-modality`, `--task-to-test`.

Offline smoke:
  python -m omni_avsr_tpu.cli.eval_omni --synthetic 4 --exp-dir /tmp/omni_eval
"""

from __future__ import annotations

import argparse
import os

from ..config import TrainConfig
from ..data.datamodule import DataModule
from ..data.noise import load_noise_bank
from ..train.engine import OmniEngine
from ..utils.metrics import BleuScorer, WerAccumulator
from .common import (
    add_common_args,
    build_data_config,
    build_model,
    build_params,
    maybe_synthetic,
    str2bool,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser("eval_omni")
    add_common_args(p)
    p.add_argument("--task-to-test", default=None,
                   choices=[None, "asr", "vsr", "avsr"],
                   help="restrict the sweep to one task")
    p.add_argument("--test-specific-modality", default=None,
                   choices=[None, "audio", "video", "audiovisual"])
    p.add_argument("--test-specific-ratio", type=int, nargs="+", default=None,
                   help="[audio_rate] / [video_rate] / [audio_rate video_rate]")
    p.add_argument("--quantize-decode", default=None,
                   choices=[None, "int8", "int4"],
                   help="weight-only quantized decode: int8 halves HBM "
                        "weight traffic; int4 = packed nibble runtime "
                        "(opt-in, for native-S4 toolchains — PARITY.md)")
    p.add_argument("--test-batch-size", type=int, default=1,
                   help="decode N utterances at once (masked prefix keeps batch-1 semantics)")
    p.add_argument("--print-hyp", type=str2bool, default=True,
                   help="print gold vs generated per sample (`lightning:203-204`)")
    p.add_argument("--output-json", default=None,
                   help="write the WER results dict to this path")
    p.add_argument("--score-bleu", type=str2bool, default=False,
                   help="also report corpus BLEU-4 per setting (fairseq "
                        "libbleu equivalent)")
    return p.parse_args(argv)


TASK_ALIASES = {"asr": "audio", "vsr": "video", "avsr": "audiovisual"}


def rate_grid(args, model, task):
    if args.test_specific_ratio:
        r = args.test_specific_ratio
        if task == "audio":
            return [(r[0], None)]
        if task == "video":
            return [(None, r[-1])]
        return [(r[0], r[-1])]
    if task == "audio":
        return [(ra, None) for ra in model.cfg.audio_rates]
    if task == "video":
        return [(None, rv) for rv in model.cfg.video_rates]
    return [(ra, rv) for ra in model.cfg.audio_rates for rv in model.cfg.video_rates]


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(getattr(args, "compilation_cache_dir", None))
    maybe_synthetic(args)
    os.makedirs(args.exp_dir, exist_ok=True)

    model = build_model(args)
    params = build_params(args, model)
    data_cfg = build_data_config(args)
    noise = load_noise_bank(args.noise_path) if args.decode_snr_target < 999998 else None
    engine = OmniEngine(
        model, params, TrainConfig(), 1.0,
        unfrozen_modules=tuple(args.unfrozen_modules),
        noise_bank=noise, decode_snr_target=args.decode_snr_target,
        inference_only=True, seed=args.seed,
    )
    merged = engine.merged_params()
    if args.quantize_decode:
        from ..ops.quant import quantize_for_decode

        merged = quantize_for_decode(merged, args.quantize_decode)

    if args.test_specific_modality:
        tasks = [args.test_specific_modality]
    elif args.task_to_test:
        tasks = [TASK_ALIASES[args.task_to_test]]
    elif args.modality != "audiovisual":
        tasks = [args.modality]
    else:
        tasks = ["audio", "video", "audiovisual"]

    results = {}
    for task in tasks:
        dm = DataModule(data_cfg, model.tok, modality=task)
        for ra, rv in rate_grid(args, model, task):
            acc = WerAccumulator()
            bleu = BleuScorer() if args.score_bleu else None
            for batch in dm.test_batches(args.test_batch_size):
                hyps = engine.decode_batch(merged, batch, task, ra, rv)
                for ref, hyp in zip(batch["gold_text"], hyps):
                    acc.update(ref, hyp)
                    if bleu is not None:
                        bleu.update(ref, hyp)
                    if args.print_hyp:
                        print(f"GOLD: {ref}\nHYP : {hyp}")
            key = f"{task} (a={ra}, v={rv})"
            results[key] = acc.wer
            print(f"WER {key}: {acc.wer:.4f} "
                  f"({acc.total_edit_distance}/{acc.total_length})")
            if bleu is not None:
                print(f"{key}: {bleu.result_string()}")

    print("\n=== summary ===")
    for k, v in results.items():
        print(f"{k}: {100 * v:.2f}%")
    if args.output_json:
        import json

        with open(args.output_json, "w") as f:
            json.dump({k: round(v, 6) for k, v in results.items()}, f, indent=2)
        print(f"wrote {args.output_json}")
    return results


if __name__ == "__main__":
    main()
