"""High-level serving API: one object, raw media in, transcript out.

The reference has no serving layer (inference = eval scripts); this is the
"switching user" entry point:

    from omni_avsr_tpu.serve import Transcriber

    t = Transcriber.from_pretrained("model_avg_4.pth", llm_model="meta-llama/Llama-3.2-1B")
    text = t.transcribe(audio=waveform_16k)                      # ASR
    text = t.transcribe(video=mouth_roi_frames)                  # VSR
    text = t.transcribe(audio=waveform_16k, video=frames)        # AVSR
    text = t.transcribe_file("clip.mp4")                         # preprocess + AVSR

Decode programs are jit-cached per (modality, rates, shape bucket); repeat
calls at similar lengths reuse compiled executables.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .config import OmniConfig, TrainConfig
from .data.tokenizer import TokenizerBundle, load_hf_tokenizer
from .models.omni import OmniAVSR
from .ops.audio_frontend import whisper_token_len
from .train.engine import OmniEngine, _round_up


def bucket_ladder(n: int, base: int) -> int:
    """Smallest ladder class >= n (base, then ~1.5x geometric steps rounded
    to base). Serving pads to LADDER classes, not raw multiples: a bounded
    class set bounds compile count, and — because the HTTP batcher groups
    requests by class (`cli/serve_http.py`) — every batch's shared padded
    window equals each member's OWN class, so a request's transcript never
    depends on what it was co-batched with."""
    v = base
    while v < n:
        v = _round_up(int(v * 1.5), base)
    return v


class Transcriber:
    def __init__(
        self,
        model: OmniAVSR,
        params: Dict,
        num_beams: Optional[int] = None,
        max_new_tokens: Optional[int] = None,
        video_pad_multiple: int = 32,
        quantize: Optional[str] = None,  # "int8" halves decode weight traffic
        mesh=None,  # jax.sharding.Mesh: tp-shard the model across chips
    ):
        self.model = model
        self.engine = OmniEngine(model, params, TrainConfig(), 1.0, noise_bank=None,
                                 inference_only=True)
        self.params = self.engine.merged_params()
        if quantize:
            from .ops.quant import quantize_for_decode

            # fused q|k|v / gate|up streams only off-mesh: the tp partition
            # rules shard those projections separately. int4 = the packed
            # nibble runtime (relay-safe, LLM-only, single-chip; opt-in —
            # slower than int8 without native S4, PARITY.md)
            assert quantize == "int8" or mesh is None, \
                "int4 packed runtime is single-chip"
            self.params = quantize_for_decode(
                self.params, quantize, fuse_projections=mesh is None)
        self.mesh = mesh
        if mesh is not None:
            from .ops.beam_attention import beam_attn_shardable

            llm_cfg = model.cfg.llm
            if beam_attn_shardable(llm_cfg.num_heads, llm_cfg.num_kv_heads,
                                   mesh):
                # keep the fused beam-attention kernel under the mesh: it is
                # shard_map-ed over the tp axis (per-kv-head parallel, no
                # collectives), so GSPMD never sees the raw custom call
                self.engine.decode_attn_mesh = mesh
            else:
                # heads don't divide the tp axis — fall back to the
                # partitionable XLA attention route
                self.engine.decode_attn_route = "xla"
        if mesh is not None:
            # Multi-chip serving: tp-shard the LLM matmuls (+ encoder FFNs)
            # over the mesh and let GSPMD insert the collectives inside the
            # same jitted decode programs. Batch stays unsharded — model
            # parallelism is the serving axis (latency), dp is just more
            # replicas of the Transcriber.
            from .parallel.partitioning import (
                clamp_specs_to_shapes,
                decode_partition_specs,
                shard_params,
            )

            specs = clamp_specs_to_shapes(
                mesh, self.params, decode_partition_specs(self.params)
            )
            self.params = shard_params(mesh, self.params, specs)
        self.num_beams = num_beams if num_beams is not None else model.cfg.num_beams
        self.max_new = max_new_tokens if max_new_tokens is not None else model.cfg.max_dec_tokens
        self.video_pad_multiple = video_pad_multiple

    # ------------------------------------------------------------- loading

    @classmethod
    def from_pretrained(
        cls,
        checkpoint_path: str,
        llm_model: str = "meta-llama/Llama-3.2-1B",
        tokenizer: Optional[TokenizerBundle] = None,
        cfg: Optional[OmniConfig] = None,
        **kwargs,
    ) -> "Transcriber":
        """Load a trained reference .pth (or orbax dir) + tokenizer."""
        from .config import LoRAConfig, LLM_REGISTRY, avhubert_large, default_v_divisor, whisper_medium_en
        import dataclasses

        tok = tokenizer if tokenizer is not None else load_hf_tokenizer(llm_model)
        if cfg is None:
            lora = LoRAConfig(rank_divisor=32, alpha=4, task_specific=True,
                              v_out_divisor=default_v_divisor(llm_model))
            cfg = OmniConfig(
                llm_model=llm_model,
                llm=LLM_REGISTRY[llm_model](lora=lora, vocab_size=tok.vocab_size),
                whisper=whisper_medium_en(), avhubert=avhubert_large(),
            )
        model = OmniAVSR(cfg, tok)
        if os.path.isdir(checkpoint_path):
            # framework orbax checkpoint: trainable tree only — base towers
            # must come from base_params (converted torch weights) or init
            import jax
            import jax.numpy as jnp

            from .train.checkpoint import latest_checkpoint, restore_trainable
            from .train.state import merge_params

            base = kwargs.pop("base_params", None)
            allow_random = kwargs.pop("allow_random_base", False)
            if base is None:
                if not allow_random:
                    raise ValueError(
                        "framework checkpoints store only the trainable split "
                        "(LoRA/projectors); the frozen Whisper/AV-HuBERT/LLM "
                        "towers must come from `base_params` (converted torch "
                        "weights — see omni_avsr_tpu.convert). Loading without "
                        "them would silently produce garbage transcripts. Pass "
                        "base_params=..., or allow_random_base=True for tests."
                    )
                base = model.init_params(jax.random.PRNGKey(0))
            path = checkpoint_path
            if not os.path.basename(path).startswith("step_"):
                path = latest_checkpoint(path) or path
            trained = jax.tree_util.tree_map(jnp.asarray, restore_trainable(path))
            params = merge_params(trained, base)
        else:
            from .convert.omni_ckpt import convert_omni_checkpoint, load_torch_checkpoint

            params = convert_omni_checkpoint(load_torch_checkpoint(checkpoint_path), cfg)
        return cls(model, params, **kwargs)

    # ---------------------------------------------------------- transcribe

    def transcribe(
        self,
        audio: Optional[np.ndarray] = None,  # (S,) f32 @ 16 kHz
        video: Optional[np.ndarray] = None,  # (T, 96, 96, C) uint8 mouth ROI
        modality: Optional[str] = None,
        rate_audio: Optional[int] = None,
        rate_video: Optional[int] = None,
        num_beams: Optional[int] = None,
    ) -> str:
        assert audio is not None or video is not None
        if modality is None:
            modality = ("audiovisual" if (audio is not None and video is not None)
                        else "audio" if audio is not None else "video")
        cfg = self.model.cfg
        rate_audio = rate_audio or cfg.audio_rates[0]
        rate_video = rate_video or cfg.video_rates[0]

        batch: Dict[str, np.ndarray] = {}
        if video is not None:
            T = len(video)
            Tp = bucket_ladder(T, self.video_pad_multiple)
            v = np.zeros((1, Tp) + video.shape[1:], np.uint8)
            v[0, :T] = video
            batch["video"] = v
            batch["video_len"] = np.asarray([T], np.int32)
        if audio is not None:
            S = len(audio)
            if video is not None:
                Sp = batch["video"].shape[1] * 640
            else:
                Sp = bucket_ladder(S, 640 * self.video_pad_multiple)
            a = np.zeros((1, Sp), np.float32)
            a[0, :min(S, Sp)] = audio[:Sp]
            batch["audio"] = a
            batch["audio_len"] = np.asarray([min(S, Sp)], np.int32)
            batch["audio_trim_len"] = int(min(_round_up(whisper_token_len(Sp), 25), 1500))
        hyps = self.engine.decode_batch(
            self.params, batch, modality, rate_audio, rate_video,
            num_beams=num_beams if num_beams is not None else self.num_beams,
            max_new=self.max_new,
        )
        return hyps[0]

    def transcribe_many(
        self,
        items: Sequence[Dict[str, Optional[np.ndarray]]],  # {"audio","video"}
        modality: Optional[str] = None,
        rate_audio: Optional[int] = None,
        rate_video: Optional[int] = None,
        num_beams: Optional[int] = None,
    ) -> List[str]:
        """Batched transcription: pads every item to one shared bucket-class
        window and decodes them in a single program. Per-sample token counts
        stay exact inside the static layout (the gap-tolerant masked prefix,
        `models/omni.py::infer_prefix_masked`); results match per-item
        `transcribe` calls EXACTLY for items whose own `bucket_class` equals
        the batch's (the longest item always; every item when the caller
        groups by class, as the HTTP batcher does). Items below the batch
        class see a larger whisper window than they would alone — same
        tokens kept, but conv-frontend edge frames and encoder attention
        over the padded span can differ at f32 noise level."""
        assert items
        if modality is None:
            first = items[0]
            has_a = first.get("audio") is not None
            has_v = first.get("video") is not None
            modality = ("audiovisual" if has_a and has_v
                        else "audio" if has_a else "video")
        cfg = self.model.cfg
        rate_audio = rate_audio or cfg.audio_rates[0]
        rate_video = rate_video or cfg.video_rates[0]
        B = len(items)
        use_v = modality in ("video", "audiovisual")
        use_a = modality in ("audio", "audiovisual")

        batch: Dict[str, np.ndarray] = {}
        if use_v:
            Ts = [len(it["video"]) for it in items]
            Tp = bucket_ladder(max(Ts), self.video_pad_multiple)
            shape = items[0]["video"].shape[1:]
            v = np.zeros((B, Tp) + shape, np.uint8)
            for b, it in enumerate(items):
                v[b, : Ts[b]] = it["video"]
            batch["video"] = v
            batch["video_len"] = np.asarray(Ts, np.int32)
        if use_a:
            Ss = [len(it["audio"]) for it in items]
            if use_v:
                Sp = batch["video"].shape[1] * 640
            else:
                Sp = bucket_ladder(max(Ss), 640 * self.video_pad_multiple)
            a = np.zeros((B, Sp), np.float32)
            for b, it in enumerate(items):
                s = min(Ss[b], Sp)
                a[b, :s] = it["audio"][:s]
            batch["audio"] = a
            batch["audio_len"] = np.asarray(
                [min(s, Sp) for s in Ss], np.int32)
            batch["audio_trim_len"] = int(
                min(_round_up(whisper_token_len(Sp), 25), 1500))
        return self.engine.decode_batch(
            self.params, batch, modality, rate_audio, rate_video,
            num_beams=num_beams if num_beams is not None else self.num_beams,
            max_new=self.max_new,
        )

    def bucket_class(self, item: Dict[str, Optional[np.ndarray]],
                     modality: str) -> Tuple[str, int]:
        """The padded-window class this item decodes at alone. The HTTP
        batcher groups requests by this key so batched results are exactly
        the per-item ones (see transcribe_many)."""
        if modality in ("video", "audiovisual"):
            return ("v", bucket_ladder(len(item["video"]),
                                       self.video_pad_multiple))
        return ("a", bucket_ladder(len(item["audio"]),
                                   640 * self.video_pad_multiple))

    def transcribe_file(
        self,
        path: str,
        preprocessed: bool = False,
        detector: str = "auto",
        mean_face_path: Optional[str] = None,
        **kwargs,
    ) -> str:
        """mp4 (+ sibling wav) -> transcript. With preprocessed=False the
        mouth-ROI chain runs first (reference single-clip demo flow); pass
        mean_face_path to warp onto the reference `20words_mean_face.npy`."""
        from .data.dataset import load_audio, load_video

        frames = load_video(path)
        try:
            audio = load_audio(path)
        except Exception:
            audio = None
        if not preprocessed:
            from .preprocess.detector import build_detector
            from .preprocess.mean_face import load_mean_face
            from .preprocess.video_process import extract_mouth_rois

            det = build_detector(detector)
            frames = extract_mouth_rois(
                frames, det(frames), load_mean_face(mean_face_path)
            )
            if frames is None:
                raise ValueError(
                    f"{path}: no usable landmarks or clip shorter than the "
                    "12-frame smoothing window"
                )
            # reference ROIs are grayscale; the model pipeline takes 3-channel
            frames = np.repeat(frames[..., None], 3, axis=-1)
        if audio is not None:
            audio = audio[: len(frames) * 640]
        return self.transcribe(audio=audio, video=frames, **kwargs)
