"""Shared CLI plumbing: the reference's flag surface (`train_OmniAVSR.py:75-391`)
mapped onto typed configs, plus model/param builders."""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import (
    AVHubertConfig,
    DataConfig,
    LLM_REGISTRY,
    LoRAConfig,
    OmniConfig,
    TrainConfig,
    WhisperEncoderConfig,
    avhubert_large,
    default_v_divisor,
    whisper_medium_en,
)
from ..data.tokenizer import TokenizerBundle, load_hf_tokenizer, synthetic_tokenizer
from ..models.omni import OmniAVSR


def str2bool(v: str) -> bool:
    # NOTE: the reference uses `type=bool` (any non-empty string is True,
    # `train_OmniAVSR.py:159-163`); we keep the flag names but parse sanely.
    return str(v).lower() not in ("false", "0", "no", "")


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--exp-dir", default="./exp")
    p.add_argument("--exp-name", default="omni")
    p.add_argument("--modality", default="audiovisual",
                   choices=["audio", "video", "audiovisual"])
    p.add_argument("--llm-model", default="meta-llama/Llama-3.2-1B")
    p.add_argument("--audio-encoder-name", default="openai/whisper-medium.en")
    p.add_argument("--pretrain-avhubert-enc-video-path", default=None)
    p.add_argument("--use-lora-avhubert", type=str2bool, default=True)
    p.add_argument("--add-PETF-LLM", default="lora")
    p.add_argument("--rank", type=int, default=32)
    p.add_argument("--alpha", type=int, default=4)
    p.add_argument("--is-task-specific", type=str2bool, default=True)
    p.add_argument("--use-shared-lora-task-specific", type=str2bool, default=False)
    p.add_argument("--is-matryoshka", type=str2bool, default=True)
    p.add_argument("--is-single-matry-projector", type=str2bool, default=False)
    p.add_argument("--compression-mode", default="avg-pooling", choices=["avg-pooling", "stack"])
    p.add_argument("--whisper-input-mode", default="pad30s", choices=["pad30s", "bucket"],
                   help="pad30s = reference-exact 30 s whisper window; bucket "
                        "computes only the batch's audio window (~6x less "
                        "whisper compute, opt-in — see config.py)")
    p.add_argument("--fused-task-forward", type=str2bool, default=False,
                   help="run the 3 training tasks as ONE stacked decoder "
                        "forward (identical losses, better MXU tiling)")
    p.add_argument("--downsample-ratio-audio", type=int, nargs="+", default=[4, 16])
    p.add_argument("--downsample-ratio-video", type=int, nargs="+", default=[2, 5])
    p.add_argument("--matry-weights", type=float, nargs=3, default=[1.0, 1.5, 1.0])
    p.add_argument("--no-layernorm-projector", type=str2bool, default=False)
    p.add_argument("--intermediate-size", type=int, default=2048)
    p.add_argument("--prompt-audio", default="Transcribe speech to text.")
    p.add_argument("--prompt-video", default="Transcribe video to text.")
    p.add_argument("--prompt-audiovisual", default="Transcribe speech and video to text.")
    p.add_argument("--unfrozen-modules", nargs="+", default=["peft_llm", "lora_avhubert"])
    p.add_argument("--max-dec-tokens", type=int, default=32)
    p.add_argument("--num-beams", type=int, default=15)
    # data
    p.add_argument("--root-dir", default="")
    p.add_argument("--train-file", default="")
    p.add_argument("--val-file", default="")
    p.add_argument("--test-file", default="")
    p.add_argument("--max-frames-audio", type=int, default=1500)
    p.add_argument("--max-frames-video", type=int, default=1000)
    p.add_argument("--max-frames-audiovisual", type=int, default=1000)
    p.add_argument("--train-num-buckets", type=int, default=400)
    p.add_argument("--num-workers", type=int, default=5)
    p.add_argument("--decode-snr-target", type=float, default=999999)
    p.add_argument("--noise-path", default=None)
    # checkpoints
    p.add_argument("--pretrained-model-path", default=None,
                   help="trained reference .pth / orbax dir to load")
    p.add_argument("--whisper-path", default=None, help="HF whisper dir or .bin/.safetensors")
    p.add_argument("--llm-path", default=None, help="HF llama/qwen dir")
    p.add_argument("--seed", type=int, default=42)
    # multi-host / mesh (reference: lightning DDP `--num_nodes`,
    # `train_OmniAVSR.py:40-56`; here jax.distributed + a global mesh)
    p.add_argument("--num-nodes", type=int, default=1,
                   help="number of hosts; >1 initializes jax.distributed")
    p.add_argument("--coordinator-address", default=None,
                   help="host:port of process 0 (SLURM auto-detected if unset)")
    p.add_argument("--node-rank", type=int, default=None,
                   help="this process's rank (SLURM_PROCID if unset)")
    p.add_argument("--mesh-tp", type=int, default=1,
                   help="tensor-parallel mesh axis size (devices split dp x tp)")
    p.add_argument("--fsdp", type=str2bool, default=False,
                   help="additionally shard LLM matrices over the dp axis "
                        "(ZeRO-3 / the reference's commented FSDPStrategy)")
    p.add_argument("--mesh-pp", type=int, default=1,
                   help="pipeline-parallel stages: the decoder layer stack "
                        "shards over a pp mesh axis and the train step runs "
                        "the GPipe schedule (parallel/pipeline.py)")
    p.add_argument("--pp-microbatches", type=int, default=4,
                   help="GPipe microbatches per step (batch must divide)")
    p.add_argument("--mesh-ep", type=int, default=1,
                   help="expert-parallel axis: shards --moe-experts expert "
                        "weights over an ep mesh axis (models/moe.py)")
    p.add_argument("--sequence-parallel", type=str2bool, default=False,
                   help="shard the decoder residual stream's time axis over "
                        "tp between layers (sets OMNI_SP=1; needs --mesh-tp>1)")
    # MoE decoder option (BASE-layer capability; the reference vendors
    # fairseq BASE layers but never activates them)
    p.add_argument("--moe-experts", type=int, default=0,
                   help="replace each decoder MLP with an E-expert MoE FFN")
    p.add_argument("--moe-routing", default="balanced",
                   choices=["balanced", "top1"],
                   help="balanced = BASE-style equal loads (no aux loss); "
                        "top1 = Switch-style capacity routing")
    p.add_argument("--moe-capacity-factor", type=float, default=1.25)
    p.add_argument("--compilation-cache-dir", default=None,
                   help="persistent XLA compile cache (or $OMNI_COMPILE_CACHE)"
                        " — makes the static-shape program matrix a "
                        "once-per-machine cost (benchmarks/compile_budget.py)")
    # offline smoke mode
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic train clips and run offline with a tiny model")
    p.add_argument("--tiny", type=str2bool, default=False,
                   help="tiny encoder/LLM dims (smoke tests)")


def tiny_dims() -> Tuple[WhisperEncoderConfig, AVHubertConfig, Dict[str, int]]:
    whisper = WhisperEncoderConfig(hidden_size=64, num_layers=2, num_heads=4, ffn_dim=128)
    avhubert = AVHubertConfig(
        encoder_embed_dim=64, encoder_layers=2, encoder_heads=4,
        encoder_ffn_dim=128, audio_feat_dim=26, lora_rank_divisor=16,
    )
    llm_dims = dict(hidden_size=128, intermediate_size=256, num_layers=2,
                    num_heads=8, num_kv_heads=4, head_dim=16)
    return whisper, avhubert, llm_dims


def build_model(args) -> OmniAVSR:
    import dataclasses

    use_tiny = args.tiny or args.synthetic
    lora = None
    if args.add_PETF_LLM == "lora":
        lora = LoRAConfig(
            rank_divisor=args.rank, alpha=args.alpha,
            task_specific=args.is_task_specific,
            shared=args.use_shared_lora_task_specific,
            v_out_divisor=default_v_divisor(args.llm_model),
        )

    if use_tiny:
        tok = synthetic_tokenizer("qwen" if "Qwen" in args.llm_model else "llama")
        whisper, avhubert, llm_dims = tiny_dims()
        from ..config import LLMConfig

        llm = LLMConfig(
            family=tok.family, vocab_size=tok.vocab_size,
            rope_scaling_factor=32.0 if tok.family == "llama" else None,
            attention_bias=(tok.family == "qwen"),
            lora=dataclasses.replace(lora, rank_divisor=8, v_out_divisor=2) if lora else None,
            **llm_dims,
        )
    else:
        tok = load_hf_tokenizer(args.llm_model)
        llm = LLM_REGISTRY[args.llm_model](lora=lora, vocab_size=tok.vocab_size)
        name = args.audio_encoder_name
        if "medium" in name:
            whisper = whisper_medium_en()
        elif "small" in name:
            from ..config import whisper_small_en

            whisper = whisper_small_en()
        else:
            from ..config import whisper_base_en

            whisper = whisper_base_en()
        avhubert = avhubert_large(use_lora=args.use_lora_avhubert)

    if getattr(args, "moe_experts", 0):
        llm = dataclasses.replace(
            llm, moe_experts=args.moe_experts, moe_routing=args.moe_routing,
            moe_capacity_factor=args.moe_capacity_factor)

    rates_a = tuple(args.downsample_ratio_audio)
    rates_v = tuple(args.downsample_ratio_video)
    if not args.is_matryoshka:
        rates_a, rates_v = rates_a[:1], rates_v[:1]

    cfg = OmniConfig(
        llm_model=args.llm_model, llm=llm, whisper=whisper, avhubert=avhubert,
        modality=args.modality, compression_mode=args.compression_mode,
        whisper_input_mode=getattr(args, "whisper_input_mode", "pad30s"),
        fused_task_forward=getattr(args, "fused_task_forward", False),
        downsample_ratio_audio=rates_a, downsample_ratio_video=rates_v,
        is_matryoshka=args.is_matryoshka,
        is_single_matry_projector=args.is_single_matry_projector,
        remove_layernorm_from_projector=args.no_layernorm_projector,
        projector_intermediate_size=(32 if use_tiny else args.intermediate_size),
        matry_weights=tuple(args.matry_weights),
        is_task_specific=args.is_task_specific,
        use_shared_lora_task_specific=args.use_shared_lora_task_specific,
        prompt_audio=args.prompt_audio, prompt_video=args.prompt_video,
        prompt_audiovisual=args.prompt_audiovisual,
        max_dec_tokens=args.max_dec_tokens, num_beams=args.num_beams,
    )
    return OmniAVSR(cfg, tok)


def build_params(args, model: OmniAVSR) -> Dict[str, Any]:
    """Parameter source resolution: trained ckpt > base torch ckpts > random.

    An orbax checkpoint directory stores only the TRAINABLE tree (TrainState
    of LoRA+projectors), so the frozen towers still come from the base torch
    checkpoints (or random init) and the trained leaves are merged on top.
    """
    if args.pretrained_model_path and not os.path.isdir(args.pretrained_model_path):
        from ..convert.omni_ckpt import convert_omni_checkpoint, load_torch_checkpoint

        sd = load_torch_checkpoint(args.pretrained_model_path)
        return convert_omni_checkpoint(sd, model.cfg)

    params = model.init_params(jax.random.PRNGKey(args.seed))
    if args.whisper_path:
        from ..convert.omni_ckpt import load_torch_checkpoint
        from ..convert.whisper_torch import convert_whisper_encoder

        sd = load_torch_checkpoint(args.whisper_path)
        sd = {k.replace("model.encoder.", "").replace("encoder.", "", 1)
              if k.startswith(("model.encoder.", "encoder.")) else k: v
              for k, v in sd.items()}
        params["whisper"] = convert_whisper_encoder(sd, model.cfg.whisper)
    if args.pretrain_avhubert_enc_video_path:
        from ..convert.avhubert_torch import convert_avhubert
        from ..convert.omni_ckpt import load_torch_checkpoint

        sd = load_torch_checkpoint(args.pretrain_avhubert_enc_video_path)
        params["avhubert"] = convert_avhubert(sd, model.cfg.avhubert)
    if args.llm_path:
        from ..convert.llm_torch import convert_llm
        from ..convert.omni_ckpt import load_torch_checkpoint

        sd = load_torch_checkpoint(args.llm_path)
        params["llm"] = convert_llm(sd, model.cfg.llm)

    if args.pretrained_model_path and os.path.isdir(args.pretrained_model_path):
        # framework-trained orbax checkpoint: merge the trainable tree
        import jax.numpy as jnp

        from ..train.checkpoint import latest_checkpoint, restore_trainable
        from ..train.state import merge_params

        path = args.pretrained_model_path
        if not os.path.basename(path).startswith("step_"):
            path = latest_checkpoint(path) or path
        trained = restore_trainable(path)
        trained = jax.tree_util.tree_map(lambda x: jnp.asarray(x), trained)
        params = merge_params(trained, params)
    return params


def setup_distributed(args) -> bool:
    """Call FIRST in a train CLI main (before anything touches jax devices).
    Returns True when running multi-process."""
    from ..parallel.distributed import maybe_initialize_distributed
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(getattr(args, "compilation_cache_dir", None))
    return maybe_initialize_distributed(
        num_nodes=getattr(args, "num_nodes", 1),
        coordinator_address=getattr(args, "coordinator_address", None),
        node_rank=getattr(args, "node_rank", None),
    )


def setup_parallelism(args, params):
    """Build the global (dp[, pp][, ep], tp) mesh + batch feed + optional
    `PipelinePlan` when multi-process or any model axis > 1 is requested;
    otherwise (None, identity, None).

    The feed slices each host's rows out of the deterministic global batch
    stream (every host iterates the same batches — seeds are shared — and
    keeps rows [p*k, (p+1)*k)) and assembles global dp-sharded arrays via
    `jax.make_array_from_process_local_data`. LLM params are sharded in
    place: matmuls over tp (+dp under --fsdp), the stacked layer axis over
    pp (GPipe, `parallel/pipeline.py`), MoE expert weights over ep."""
    pp = getattr(args, "mesh_pp", 1)
    ep = getattr(args, "mesh_ep", 1)
    tp = getattr(args, "mesh_tp", 1)
    if getattr(args, "sequence_parallel", False):
        # the residual-stream constraint is P(dp, tp): it needs a tp axis
        # of size > 1 and a mesh context, else with_sharding_constraint
        # fails at trace time
        assert tp > 1, "--sequence-parallel needs --mesh-tp > 1"
        os.environ["OMNI_SP"] = "1"
    use_mesh = (jax.process_count() > 1 or tp > 1 or pp > 1 or ep > 1
                or getattr(args, "fsdp", False))
    if not use_mesh:
        return None, (lambda b: b), None

    import numpy as np

    from ..config import MeshConfig
    from ..parallel.distributed import global_batch_from_local, host_shard_slice
    from ..parallel.mesh import AXIS_DP, make_mesh
    from ..parallel.partitioning import (
        clamp_specs_to_shapes,
        llm_partition_specs,
        shard_params,
    )

    n = len(jax.devices())
    model_axes = tp * pp * ep
    assert n % model_axes == 0, (
        f"{n} devices not divisible by tp*pp*ep={model_axes}")
    mesh = make_mesh(MeshConfig(dp=n // model_axes, tp=tp, pp=pp, ep=ep))

    plan = None
    specs = llm_partition_specs(params["llm"],
                                fsdp=getattr(args, "fsdp", False),
                                ep=ep > 1)
    if pp > 1:
        from ..parallel.pipeline import AXIS_PP, PipelinePlan, pipeline_layer_specs

        # the stacked layer axis shards over pp (the shard_map in_specs of
        # pipeline_backbone); embed/final-norm/lm_head keep the tp rules
        specs["layers"] = pipeline_layer_specs(params["llm"]["layers"])
        plan = PipelinePlan(
            mesh, num_microbatches=getattr(args, "pp_microbatches", 4),
            axis=AXIS_PP, dp_axis=AXIS_DP)
    specs = clamp_specs_to_shapes(mesh, params["llm"], specs)
    params["llm"] = shard_params(mesh, params["llm"], specs)

    P_ = jax.process_count()

    def feed(batch):
        arrays = {k: v for k, v in batch.items()
                  if not isinstance(v, (int, float, str, list))}
        rest = {k: v for k, v in batch.items() if k not in arrays}
        B = next(iter(arrays.values())).shape[0]
        assert B % P_ == 0, (
            f"global batch {B} not divisible by {P_} processes — raise the "
            f"batch bucket size or lower --num-nodes")
        sl = host_shard_slice(B)
        local = {k: np.asarray(v)[sl] for k, v in arrays.items()}
        out = global_batch_from_local(mesh, local)
        out.update(rest)
        return out

    return mesh, feed, plan


def build_data_config(args) -> DataConfig:
    return DataConfig(
        root_dir=args.root_dir, train_file=args.train_file,
        val_file=args.val_file, test_file=args.test_file,
        max_frames_audio=args.max_frames_audio,
        max_frames_video=args.max_frames_video,
        max_frames_audiovisual=args.max_frames_audiovisual,
        train_num_buckets=args.train_num_buckets,
        num_workers=args.num_workers,
        decode_snr_target=args.decode_snr_target,
    )


def maybe_synthetic(args) -> None:
    """--synthetic N: generate an offline corpus and point the data flags at it."""
    if not args.synthetic:
        return
    from ..data.synthetic import generate_corpus

    out_dir = os.path.join(args.exp_dir, "synthetic_data")
    os.makedirs(out_dir, exist_ok=True)
    train_csv, val_csv, test_csv = generate_corpus(out_dir, n_train=args.synthetic)
    args.root_dir = out_dir
    args.train_file = train_csv
    args.val_file = val_csv
    args.test_file = test_csv
    args.max_frames_audiovisual = 200
    args.train_num_buckets = 4
    args.num_workers = 2
    args.num_beams = min(args.num_beams, 3)
