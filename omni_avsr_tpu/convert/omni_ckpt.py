"""Trained Omni-AVSR / Llama-AVSR checkpoint -> full framework param tree.

The reference saves the whole `AVSR_LLMs` state_dict (lightning strips the
`model.` prefix at eval load, `lightning_OmniAVSR.py:148-150`;
`utils/avg_checkpoints.py` averages the same layout). Subtrees:

  audio_encoder.*       HF Whisper encoder           -> params["whisper"]
  video_encoder.*       fairseq AVHubert (+ LoRA)    -> params["avhubert"]
  audio_proj.* /
  video_proj.*          Sequential / ModuleList MLPs -> projector bundles
  llm.*                 Llama/Qwen ForCausalLM_lora  -> params["llm"]
  prompt_* buffers      recomputed from the tokenizer (skipped)

Projector LayerNorm presence is derived from which keys exist, which
resolves the reference's inconsistent LN quirks automatically
(`modeling_OmniAVSR.py:104,162,188` — see models/projector.py).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp

from ..config import OmniConfig
from ..models.common import Params
from .avhubert_torch import convert_avhubert
from .common import layer_norm_from_torch, linear_from_torch, t2j
from .llm_torch import convert_llm
from .whisper_torch import convert_whisper_encoder


def _sub(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def _one_projector(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "fc1": linear_from_torch(sd, f"{prefix}.0"),
        "fc2": linear_from_torch(sd, f"{prefix}.2"),
    }
    if f"{prefix}.3.weight" in sd:
        p["ln"] = layer_norm_from_torch(sd, f"{prefix}.3")
    return p


def convert_projectors(
    sd: Mapping[str, Any], name: str, rates: Sequence[int]
) -> Dict[str, Any]:
    """`name` in {"audio_proj", "video_proj"}. Detects single vs per-rate."""
    if f"{name}.0.weight" in sd:  # single Sequential
        return {"single": _one_projector(sd, name)}
    return {
        "per_rate": {
            f"r{rate}": _one_projector(sd, f"{name}.{i}")
            for i, rate in enumerate(rates)
        }
    }


def convert_omni_checkpoint(
    sd: Mapping[str, Any],
    cfg: OmniConfig,
    frozen_dtype=jnp.bfloat16,
    train_dtype=jnp.float32,
) -> Params:
    """Full conversion of a trained reference checkpoint."""
    # lightning checkpoints may carry a "model." prefix
    if any(k.startswith("model.") and not k.startswith("model.layers") for k in sd):
        if not any(k.startswith("llm.") for k in sd):
            sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    params: Params = {}
    if any(k.startswith("llm.") for k in sd):
        params["llm"] = convert_llm(_sub(sd, "llm."), cfg.llm, dtype=frozen_dtype)
    if any(k.startswith("audio_encoder.") for k in sd):
        params["whisper"] = convert_whisper_encoder(
            _sub(sd, "audio_encoder."), cfg.whisper, dtype=frozen_dtype
        )
        proj = convert_projectors(sd, "audio_proj", cfg.audio_rates)
        params["audio_proj"] = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, train_dtype), proj
        )
    if any(k.startswith("video_encoder.") for k in sd):
        params["avhubert"] = convert_avhubert(
            _sub(sd, "video_encoder."), cfg.avhubert, dtype=frozen_dtype
        )
        proj = convert_projectors(sd, "video_proj", cfg.video_rates)
        params["video_proj"] = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, train_dtype), proj
        )
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference .pth/.ckpt on CPU and normalise to a flat
    state_dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return obj
