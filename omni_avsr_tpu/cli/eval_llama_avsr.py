"""Eval driver for Llama-AVSR / Llama-MTSK baselines.

Equivalent of `eval_LlamaAVSR.py:220-263`: single-modality WER;
`--downsample-ratio-test-matry` takes [video, audio] for AVSR (reference
order, `eval_LlamaAVSR.py` / `modeling_LlamaAVSR.py:365-371`).

Offline smoke:
  python -m omni_avsr_tpu.cli.eval_llama_avsr --synthetic 4 --modality audio \
      --exp-dir /tmp/llama_eval
"""

from __future__ import annotations

import argparse
import os

from ..config import TrainConfig
from ..data.datamodule import DataModule
from ..data.noise import load_noise_bank
from ..train.engine import OmniEngine
from ..utils.metrics import WerAccumulator
from .common import (
    add_common_args,
    build_data_config,
    build_model,
    build_params,
    maybe_synthetic,
    str2bool,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser("eval_llama_avsr")
    add_common_args(p)
    p.add_argument("--prompt", default="Transcribe speech to text.")
    p.add_argument("--downsample-ratio-test-matry", type=int, nargs="+", default=None,
                   help="[rate] or [video_rate, audio_rate] for AVSR")
    p.add_argument("--quantize-decode", default=None,
                   choices=[None, "int8", "int4"],
                   help="weight-only quantized decode: int8 halves HBM "
                        "weight traffic; int4 = packed nibble runtime "
                        "(opt-in, for native-S4 toolchains — PARITY.md)")
    p.add_argument("--test-batch-size", type=int, default=1,
                   help="decode N utterances at once (masked prefix keeps batch-1 semantics)")
    p.add_argument("--print-hyp", type=str2bool, default=True)
    args = p.parse_args(argv)
    args.prompt_audio = args.prompt_video = args.prompt_audiovisual = args.prompt
    args.is_task_specific = False
    args.use_shared_lora_task_specific = False
    return args


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
    engine = OmniEngine(model, params, TrainConfig(), 1.0,
                        noise_bank=noise, decode_snr_target=args.decode_snr_target,
        inference_only=True,
                        seed=args.seed)
    merged = engine.merged_params()
    if args.quantize_decode:
        from ..ops.quant import quantize_for_decode

        merged = quantize_for_decode(merged, args.quantize_decode,
                                     fuse_projections=False, llm_only=True)

    if args.downsample_ratio_test_matry:
        r = args.downsample_ratio_test_matry
        if args.modality == "audiovisual":
            grid = [(r[1], r[0])]  # reference order: [video, audio]
        elif args.modality == "audio":
            grid = [(r[0], None)]
        else:
            grid = [(None, r[0])]
    else:
        grid = engine._rate_combos(args.modality)

    dm = DataModule(data_cfg, model.tok, modality=args.modality)
    for ra, rv in grid:
        acc = WerAccumulator()
        for batch in dm.test_batches(args.test_batch_size):
            hyps = engine.decode_batch(merged, batch, args.modality, ra, rv)
            for ref, hyp in zip(batch["gold_text"], hyps):
                acc.update(ref, hyp)
                if args.print_hyp:
                    print(f"GOLD: {ref}\nHYP : {hyp}")
        print(f"WER {args.modality} (a={ra}, v={rv}): {acc.wer:.4f} "
              f"({acc.total_edit_distance}/{acc.total_length})")


if __name__ == "__main__":
    main()
