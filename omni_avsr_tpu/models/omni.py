"""Unified Omni-AVSR model: encoders + matryoshka compression + projectors +
LLM with Omni-LoRA.

TPU re-design of `Omni_AVSR/modeling_OmniAVSR.py:27-606`. Differences in
*mechanism* (the behaviour is the same):

  - Everything — log-mel frontend, Whisper, AV-HuBERT, pooling, projection,
    three LLM task forwards — runs inside ONE jitted step. No host
    round-trips (the reference bounces audio via CPU numpy every step,
    `modeling_OmniAVSR.py:528-537`).
  - The matryoshka rate and the task (modality) are static: the train driver
    samples the rate per step host-side (as the reference does with
    `random.choice`, `:474,549`) and dispatches to one of a small set of
    compiled step functions — XLA-friendly, no dynamic shapes.
  - Audio token trimming `max(int(max_len/16000*50), 25)` (`:536-537`) is a
    static per-bucket length.

Sequence assembly (Llama; Qwen drops the BOS and appends text at the end):
  train  : [BOS][<audio> A </audio>][<video> V </video>][prompt][text EOS]
  labels : [bos ][-100 ...                                    ][text EOS]
  infer  : [BOS][<audio> A </audio>][<video> V </video>][prompt]
(per-task subsets of A/V; `modeling_OmniAVSR.py:263-323, 397-458`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MODALITIES, OmniConfig
from ..data.tokenizer import IGNORE_INDEX, TokenizerBundle
from ..ops.audio_frontend import log_mel_spectrogram, whisper_token_len
from ..ops.pooling import compress
from .avhubert import avhubert_encode, init_avhubert
from .common import Params
from .llm import embed_tokens, init_llm, llm_span_stats
from .projector import init_matry_projectors, project
from .whisper import init_whisper_encoder, whisper_encode


class OmniAVSR:
    """Host-side model handle. Holds static config + tokenizer constants;
    all compute methods are pure functions of (params, arrays) safe to jit.
    Mirrors the reference `AVSR_LLMs` API surface."""

    def __init__(self, cfg: OmniConfig, tok: TokenizerBundle):
        assert tok.family == cfg.llm.family
        self.cfg = cfg
        self.tok = tok
        self.prompt_ids = {
            "audio": tok.prompt_ids(cfg.prompt_audio),
            "video": tok.prompt_ids(cfg.prompt_video),
            "audiovisual": tok.prompt_ids(cfg.prompt_audiovisual),
        }

    # ------------------------------------------------------------------ init

    def init_params(self, rng: jax.Array, frozen_dtype=jnp.bfloat16, train_dtype=jnp.float32) -> Params:
        cfg = self.cfg
        keys = jax.random.split(rng, 5)
        params: Params = {"llm": init_llm(keys[0], cfg.llm, dtype=frozen_dtype)}
        has_audio = cfg.modality in ("audio", "audiovisual")
        has_video = cfg.modality in ("video", "audiovisual")
        if has_audio and cfg.whisper is not None:
            params["whisper"] = init_whisper_encoder(keys[1], cfg.whisper, dtype=frozen_dtype)
            params["audio_proj"] = init_matry_projectors(
                keys[2], cfg.audio_rates, cfg.whisper.hidden_size,
                cfg.projector_intermediate_size, cfg.llm.hidden_size,
                cfg.compression_mode, cfg.is_matryoshka,
                cfg.is_single_matry_projector, cfg.remove_layernorm_from_projector,
                dtype=train_dtype,
            )
        if has_video and cfg.avhubert is not None:
            params["avhubert"] = init_avhubert(keys[3], cfg.avhubert, dtype=frozen_dtype)
            params["video_proj"] = init_matry_projectors(
                keys[4], cfg.video_rates, cfg.avhubert.encoder_embed_dim,
                cfg.projector_intermediate_size, cfg.llm.hidden_size,
                cfg.compression_mode, cfg.is_matryoshka,
                cfg.is_single_matry_projector, cfg.remove_layernorm_from_projector,
                dtype=train_dtype,
            )
        return params

    def trainable_predicate(self, unfrozen_modules: Tuple[str, ...] = ("peft_llm", "lora_avhubert")):
        """Path predicate for the trainable/frozen split — parity with
        `_unfreeze_PETF` (`modeling_OmniAVSR.py:234-260`): projectors always
        train; LLM LoRA iff 'peft_llm'; AV-HuBERT LoRA iff 'lora_avhubert'."""

        def pred(path: str) -> bool:
            if path.startswith(("audio_proj", "video_proj")):
                return True
            # "full_llm"/"full_towers": train the whole decoder / encoder
            # towers — NOT reference recipes (the paper trains LoRA only);
            # used by benchmarks/wer_probe.py so a tiny model can reach the
            # memorized regime its quantization study needs. Measured (r5,
            # on-chip): with FROZEN random towers the 32-clip probe
            # plateaus at CE ~= ln(32)/tokens — text memorized, clip
            # identity never linked to the AV features; trainable towers
            # make the features discriminable and the probe actually fits.
            if "full_llm" in unfrozen_modules and path.startswith("llm."):
                return True
            if "full_towers" in unfrozen_modules and path.startswith(
                    ("whisper.", "avhubert.")):
                return True
            if "peft_llm" in unfrozen_modules and path.startswith("llm.") and ".lora" in path:
                return True
            if (
                "lora_avhubert" in unfrozen_modules
                and path.startswith("avhubert.")
                and ".lora" in path
            ):
                return True
            return False

        return pred

    # -------------------------------------------------------------- encoders

    def encode_audio(
        self,
        params: Params,
        audio: jax.Array,  # (B, S) 16 kHz waveform
        audio_len: jax.Array,  # (B,) valid samples
        rate: int,
        trim_len: int,  # static: max(int(max_samples/16000*50), 25)
    ) -> jax.Array:
        """(B, trim_len//rate, d_llm) projected audio tokens."""
        if self.cfg.whisper_input_mode == "bucket":
            # compute only the bucket's window: trim_len tokens = 2*trim_len
            # mel frames (conv stride 2); kept mel frames are bit-identical
            # to the 30 s computation, only the attention span shrinks
            mel = log_mel_spectrogram(audio, audio_len, num_frames=2 * trim_len)
        else:  # reference-exact 30 s padded window
            mel = log_mel_spectrogram(audio, audio_len)
        enc = whisper_encode(params["whisper"], self.cfg.whisper, mel.astype(jnp.bfloat16))
        enc = enc[:, :trim_len]
        enc = compress(enc, rate, self.cfg.compression_mode)
        return project(params["audio_proj"], enc, rate if self._per_rate else None)

    def encode_video(
        self,
        params: Params,
        video: jax.Array,  # (B, T, H, W, 1)
        rate: int,
        train_mode: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        enc = avhubert_encode(
            params["avhubert"], self.cfg.avhubert, video.astype(jnp.bfloat16),
            train_mode=train_mode, rng=rng,
        )
        enc = compress(enc, rate, self.cfg.compression_mode)
        return project(params["video_proj"], enc, rate if self._per_rate else None)

    @property
    def _per_rate(self) -> bool:
        return self.cfg.is_matryoshka and not self.cfg.is_single_matry_projector

    # -------------------------------------------------------------- assembly

    def _delim_embeds(self, params: Params, B: int, dtype) -> Dict[str, jax.Array]:
        def e(tid: int) -> jax.Array:
            emb = embed_tokens(params["llm"], jnp.full((B, 1), tid, jnp.int32), dtype)
            return emb

        return {
            "audio_sos": e(self.tok.audio_sos_id),
            "audio_eos": e(self.tok.audio_eos_id),
            "video_sos": e(self.tok.video_sos_id),
            "video_eos": e(self.tok.video_eos_id),
        }

    def _prompt_embeds(self, params: Params, modality: str, B: int, dtype) -> jax.Array:
        ids = jnp.asarray(self.prompt_ids[modality])[None]
        emb = embed_tokens(params["llm"], ids, dtype)
        return jnp.broadcast_to(emb, (B,) + emb.shape[1:])

    def _assemble_task(
        self,
        params: Params,
        modality: str,
        av_parts: Tuple[jax.Array, ...],  # ordered audio/video feature blocks
        text_emb: jax.Array,  # (B, Tt, D)
        labels: Optional[jax.Array],  # (B, Tt) or None (inference)
    ) -> Tuple[jax.Array, Optional[jax.Array], Tuple[int, int]]:
        """Returns (embeds, labels-with-IGNORE-prefix, span) where span is
        the static [t0, t1) window of logits positions whose shifted targets
        can be non-IGNORE — everything the CE loss needs (llm_span_stats)."""
        B = text_emb.shape[0]
        dtype = text_emb.dtype
        d = self._delim_embeds(params, B, dtype)
        prompt = self._prompt_embeds(params, modality, B, dtype)

        blocks = []
        if modality in ("audio", "audiovisual"):
            blocks += [d["audio_sos"], av_parts[0], d["audio_eos"]]
        if modality in ("video", "audiovisual"):
            v = av_parts[-1]
            blocks += [d["video_sos"], v, d["video_eos"]]
        blocks.append(prompt)
        prefix = jnp.concatenate(blocks, axis=1)
        P = prefix.shape[1]

        Tt = text_emb.shape[1]
        if self.cfg.llm.family == "llama":
            # layout [BOS | prefix(P) | text(Tt-1)]: the first real target is
            # labels[:, 1] at sequence index P+1 => logits span [P, P+Tt-1)
            span = (P, P + Tt - 1)
            embeds = jnp.concatenate([text_emb[:, :1], prefix, text_emb[:, 1:]], axis=1)
            if labels is None:
                return embeds, None, span
            lab = jnp.concatenate(
                [labels[:, :1], jnp.full((B, P), IGNORE_INDEX, labels.dtype), labels[:, 1:]],
                axis=1,
            )
        else:  # qwen: prefix first, no BOS
            # layout [prefix(P) | text(Tt)]: first target labels[:, 0] at
            # sequence index P => logits span [P-1, P+Tt-1)
            span = (P - 1, P + Tt - 1)
            embeds = jnp.concatenate([prefix, text_emb], axis=1)
            if labels is None:
                return embeds, None, span
            lab = jnp.concatenate(
                [jnp.full((B, P), IGNORE_INDEX, labels.dtype), labels], axis=1
            )
        return embeds, lab, span

    # ----------------------------------------------------------- train/infer

    def train_losses(
        self,
        params: Params,
        batch: Dict[str, jax.Array],
        rate_audio: int,
        rate_video: int,
        audio_trim_len: int,
        train_mode: bool = True,
        remat: bool = True,
        dropout_rng: Optional[jax.Array] = None,
        pipeline: Optional[Any] = None,  # parallel.pipeline.PipelinePlan
    ) -> Dict[str, jax.Array]:
        """Three-task training forward. Returns matry-weighted per-task
        losses (`modeling_OmniAVSR.py:263-306`). With `pipeline`, each
        task's decoder forward runs the GPipe schedule over the plan's pp
        mesh axis (`parallel/pipeline.py`)."""
        cfg = self.cfg
        dtype = jnp.bfloat16
        text_emb = embed_tokens(params["llm"], batch["tokens"], dtype)
        labels = batch["labels"]

        a = self.encode_audio(
            params, batch["audio"], batch["audio_len"], rate_audio, audio_trim_len
        ).astype(dtype)
        v = self.encode_video(
            params, batch["video"], rate_video, train_mode, rng=dropout_rng
        ).astype(dtype)

        task_specific = bool(cfg.llm.lora and cfg.llm.lora.task_specific)
        if cfg.fused_task_forward:
            return self._fused_train_losses(
                params, a, v, text_emb, labels, task_specific, remat,
                pipeline=pipeline)

        losses = {}
        for i, m in enumerate(MODALITIES):
            parts = {"audio": (a,), "video": (v,), "audiovisual": (a, v)}[m]
            embeds, lab, span = self._assemble_task(params, m, parts, text_emb, labels)
            lora_mod = m if task_specific else None
            total, count = llm_span_stats(
                params["llm"], cfg.llm, embeds, lab, span,
                modality=lora_mod, remat=remat, pipeline=pipeline,
            )
            loss = jnp.sum(total) / jnp.maximum(jnp.sum(count), 1)
            if cfg.matry_weights is not None:
                loss = loss * cfg.matry_weights[i]
            losses[m] = loss
        return losses

    def _fused_train_losses(
        self, params, a, v, text_emb, labels, task_specific, remat,
        pipeline: Optional[Any] = None,
    ) -> Dict[str, jax.Array]:
        """One LLM forward over the three tasks stacked on the batch axis.

        Each task's sequence is right-padded to the longest (the AV task);
        under pure causal masking the padded tail can never influence valid
        positions and its labels are IGNORE_INDEX, so per-task losses are
        EXACTLY the unfused ones (pinned by tests/test_omni.py) — the
        decoder runs one (3B, T_max) program instead of three small ones.
        Measured slower than the unfused route both before (r2) and after
        (r3) the label-span lm_head slice: the backbone is compute-bound at
        AVSR shapes, so the 1x-vs-3x weight stream doesn't pay for the
        pad-token FLOPs (docs/ROUND3_NOTES.md). Kept as an option."""
        from .llm import FUSED3, llm_backbone, lm_head, token_ce_stats

        cfg = self.cfg
        B = text_emb.shape[0]
        embeds3, labels3, spans3 = [], [], []
        for m in MODALITIES:
            parts = {"audio": (a,), "video": (v,), "audiovisual": (a, v)}[m]
            e, lab, span = self._assemble_task(params, m, parts, text_emb, labels)
            embeds3.append(e)
            labels3.append(lab)
            spans3.append(span)
        T_max = max(e.shape[1] for e in embeds3)
        embeds3 = [jnp.pad(e, ((0, 0), (0, T_max - e.shape[1]), (0, 0)))
                   for e in embeds3]
        stacked = jnp.concatenate(embeds3, axis=0)

        positions = jnp.broadcast_to(
            jnp.arange(T_max, dtype=jnp.int32)[None], (3 * B, T_max))
        x = llm_backbone(params["llm"], cfg.llm, stacked, positions, None,
                         FUSED3 if task_specific else None, remat,
                         pipeline=pipeline)
        # each task's label-active span has the same width (the shared text
        # length) at a task-specific offset — slice per task block, then one
        # lm_head over the concatenated active rows (llm_span_stats, fused)
        xs, tgt3 = [], []
        for i, (t0, t1) in enumerate(spans3):
            xs.append(jax.lax.slice_in_dim(x, i * B, (i + 1) * B)[:, t0:t1])
            tgt3.append(labels3[i][:, t0 + 1 : t1 + 1])
        logits = lm_head(params["llm"], cfg.llm, jnp.concatenate(xs, axis=0))
        total, count = token_ce_stats(logits, jnp.concatenate(tgt3, axis=0))
        losses = {}
        for i, m in enumerate(MODALITIES):
            t = jnp.sum(jax.lax.slice_in_dim(total, i * B, (i + 1) * B))
            c = jnp.sum(jax.lax.slice_in_dim(count, i * B, (i + 1) * B))
            loss = t / jnp.maximum(c, 1)
            if cfg.matry_weights is not None:
                loss = loss * cfg.matry_weights[i]
            losses[m] = loss
        return losses

    def single_task_loss(
        self,
        params: Params,
        batch: Dict[str, jax.Array],
        modality: str,
        rate_audio: Optional[int] = None,
        rate_video: Optional[int] = None,
        audio_trim_len: Optional[int] = None,
        train_mode: bool = True,
        remat: bool = True,
        pipeline: Optional[Any] = None,
    ) -> jax.Array:
        """Llama-AVSR baseline: one task per model
        (`Omni_AVSR/modeling_LlamaAVSR.py`). With matryoshka, the baseline
        (Llama-MTSK) averages the loss over ALL rates each step
        (`modeling_LlamaAVSR.py:244-251`) — callers loop rates and mean."""
        cfg = self.cfg
        dtype = jnp.bfloat16
        text_emb = embed_tokens(params["llm"], batch["tokens"], dtype)
        labels = batch["labels"]
        parts = []
        if modality in ("audio", "audiovisual"):
            parts.append(
                self.encode_audio(
                    params, batch["audio"], batch["audio_len"], rate_audio, audio_trim_len
                ).astype(dtype)
            )
        if modality in ("video", "audiovisual"):
            parts.append(
                self.encode_video(params, batch["video"], rate_video, train_mode).astype(dtype)
            )
        embeds, lab, span = self._assemble_task(params, modality, tuple(parts), text_emb, labels)
        lora_mod = modality if (cfg.llm.lora and cfg.llm.lora.task_specific) else None
        total, count = llm_span_stats(
            params["llm"], cfg.llm, embeds, lab, span, modality=lora_mod,
            remat=remat, pipeline=pipeline,
        )
        return jnp.sum(total) / jnp.maximum(jnp.sum(count), 1)

    def infer_prefix(
        self,
        params: Params,
        batch: Dict[str, jax.Array],
        modality: str,
        rate_audio: Optional[int] = None,
        rate_video: Optional[int] = None,
        audio_trim_len: Optional[int] = None,
    ) -> jax.Array:
        """Decode prefix embeddings [BOS][audio][video][prompt]
        (`modeling_OmniAVSR.py:397-458`)."""
        cfg = self.cfg
        dtype = jnp.bfloat16
        B = batch["tokens"].shape[0] if "tokens" in batch else (
            batch["audio"].shape[0] if "audio" in batch else batch["video"].shape[0]
        )
        parts = []
        if modality in ("audio", "audiovisual"):
            parts.append(
                self.encode_audio(
                    params, batch["audio"], batch["audio_len"], rate_audio, audio_trim_len
                ).astype(dtype)
            )
        if modality in ("video", "audiovisual"):
            parts.append(self.encode_video(params, batch["video"], rate_video, False).astype(dtype))
        if cfg.llm.family == "llama":
            bos = embed_tokens(params["llm"], jnp.full((B, 1), self.tok.bos_id, jnp.int32), dtype)
            text_emb = bos
        else:
            text_emb = jnp.zeros((B, 0, cfg.llm.hidden_size), dtype)
        embeds, _, _ = self._assemble_task(params, modality, tuple(parts), text_emb, None)
        return embeds

    def infer_prefix_masked(
        self,
        params: Params,
        batch: Dict[str, jax.Array],
        modality: str,
        rate_audio: Optional[int] = None,
        rate_video: Optional[int] = None,
        audio_trim_max: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Decode prefix with PER-SAMPLE exact audio/video token counts
        inside a static layout: returns (embeds (B,P,D), key_valid (B,P)).

        Feature slots beyond a sample's own count are masked out of
        attention and positions collapse over the gaps, so a batched decode
        reproduces the reference's batch-size-1 semantics exactly —
        including the per-utterance whisper trim `max(int(len/16000*50),25)`
        (`modeling_OmniAVSR.py:536-537`) that the bucketed contiguous path
        can only approximate.
        """
        cfg = self.cfg
        dtype = jnp.bfloat16
        if "audio" in batch:
            B = batch["audio"].shape[0]
        else:
            B = batch["video"].shape[0]
        d = self._delim_embeds(params, B, dtype)
        prompt = self._prompt_embeds(params, modality, B, dtype)
        blocks = []
        valids = []

        def const_valid(x):
            blocks.append(x)
            valids.append(jnp.ones((B, x.shape[1]), bool))

        if cfg.llm.family == "llama":
            const_valid(embed_tokens(
                params["llm"], jnp.full((B, 1), self.tok.bos_id, jnp.int32), dtype
            ))
        if modality in ("audio", "audiovisual"):
            a = self.encode_audio(
                params, batch["audio"], batch["audio_len"], rate_audio, audio_trim_max
            ).astype(dtype)
            trim_i = whisper_token_len(batch["audio_len"])  # (B,)
            n_a = (trim_i // rate_audio).astype(jnp.int32)
            const_valid(d["audio_sos"])
            blocks.append(a)
            valids.append(jnp.arange(a.shape[1])[None] < n_a[:, None])
            const_valid(d["audio_eos"])
        if modality in ("video", "audiovisual"):
            v = self.encode_video(params, batch["video"], rate_video, False).astype(dtype)
            n_v = (batch["video_len"] // rate_video).astype(jnp.int32)
            const_valid(d["video_sos"])
            blocks.append(v)
            valids.append(jnp.arange(v.shape[1])[None] < n_v[:, None])
            const_valid(d["video_eos"])
        const_valid(prompt)
        return jnp.concatenate(blocks, axis=1), jnp.concatenate(valids, axis=1)
