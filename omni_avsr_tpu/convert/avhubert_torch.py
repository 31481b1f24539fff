"""fairseq AV-HuBERT checkpoint -> omni_avsr_tpu avhubert params.

Handles the `model` state_dict inside `large_vox_iter5.pt`-style checkpoints
(layout per `av_hubert/avhubert/hubert.py:318-427` + `resnet.py:135-169` +
fairseq `wav2vec2.py:817-1040`), plus the runtime-injected LoRA keys a
trained Omni checkpoint adds under `self_attn.lora_{down,up}_{Q,V}`
(`modeling_OmniAVSR.py:127-142`).

The pos-conv weight-norm (g, v) pair is folded into a plain conv weight at
conversion time (torch weight_norm dim=2: per-kernel-position norms over
(out, in/groups)).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np
import jax.numpy as jnp

from ..config import AVHubertConfig
from ..models.common import Params
from .common import (
    batch_norm_from_torch,
    conv3d_from_torch,
    layer_norm_from_torch,
    linear_from_torch,
    stack_dicts,
    t2j,
)


def _conv2d_nobias(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {"w": t2j(sd[key]).transpose(2, 3, 1, 0)}


def _prelu(sd: Mapping[str, Any], key: str) -> Optional[np.ndarray]:
    return t2j(sd[key]) if key in sd else None


def _basic_block(sd: Mapping[str, Any], p: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "conv1": _conv2d_nobias(sd, f"{p}.conv1.weight"),
        "bn1": batch_norm_from_torch(sd, f"{p}.bn1"),
        "conv2": _conv2d_nobias(sd, f"{p}.conv2.weight"),
        "bn2": batch_norm_from_torch(sd, f"{p}.bn2"),
    }
    for i in (1, 2):
        a = _prelu(sd, f"{p}.relu{i}.weight")
        if a is not None:
            out[f"prelu{i}"] = a
    if f"{p}.downsample.0.weight" in sd:
        out["downsample"] = {
            "conv": _conv2d_nobias(sd, f"{p}.downsample.0.weight"),
            "bn": batch_norm_from_torch(sd, f"{p}.downsample.1"),
        }
    return out


def _resnet(sd: Mapping[str, Any], root: str) -> Dict[str, Any]:
    stem: Dict[str, Any] = {
        "conv": {"w": t2j(sd[f"{root}.frontend3D.0.weight"]).transpose(2, 3, 4, 1, 0)},
        "bn": batch_norm_from_torch(sd, f"{root}.frontend3D.1"),
    }
    a = _prelu(sd, f"{root}.frontend3D.2.weight")
    if a is not None:
        stem["prelu"] = a
    out: Dict[str, Any] = {"stem": stem}
    for li in range(1, 5):
        out[f"layer{li}"] = {
            "b0": _basic_block(sd, f"{root}.trunk.layer{li}.0"),
            "b1": _basic_block(sd, f"{root}.trunk.layer{li}.1"),
        }
    return out


def fold_weight_norm_conv1d(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm(dim=2) on Conv1d weight (O, I/g, K):
    w = g * v / ||v||, norms over (O, I/g) per kernel position."""
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=(0, 1), keepdims=True))
    return (g * v / norm).astype(np.float32)


def convert_avhubert(
    sd: Mapping[str, Any], cfg: AVHubertConfig, dtype=jnp.bfloat16,
    lora_dtype=jnp.float32,
) -> Params:
    D = cfg.encoder_embed_dim
    layers = []
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        layer: Dict[str, Any] = {
            "attn_norm": layer_norm_from_torch(sd, f"{p}.self_attn_layer_norm"),
            "attn": {
                "q": linear_from_torch(sd, f"{p}.self_attn.q_proj"),
                "k": linear_from_torch(sd, f"{p}.self_attn.k_proj"),
                "v": linear_from_torch(sd, f"{p}.self_attn.v_proj"),
                "o": linear_from_torch(sd, f"{p}.self_attn.out_proj"),
            },
            "final_norm": layer_norm_from_torch(sd, f"{p}.final_layer_norm"),
            "fc1": linear_from_torch(sd, f"{p}.fc1"),
            "fc2": linear_from_torch(sd, f"{p}.fc2"),
        }
        if cfg.lora_rank_divisor:
            if f"{p}.self_attn.lora_down_Q.weight" in sd:
                layer["lora"] = {
                    "down_q": linear_from_torch(sd, f"{p}.self_attn.lora_down_Q", bias=False),
                    "up_q": linear_from_torch(sd, f"{p}.self_attn.lora_up_Q", bias=False),
                    "down_v": linear_from_torch(sd, f"{p}.self_attn.lora_down_V", bias=False),
                    "up_v": linear_from_torch(sd, f"{p}.self_attn.lora_up_V", bias=False),
                }
            else:
                # base (non-Omni) checkpoint: fresh zero-down LoRA
                r = round(D / cfg.lora_rank_divisor)
                rng = np.random.RandomState(0)
                bound = np.sqrt(1.0 / r)
                layer["lora"] = {
                    "down_q": {"w": np.zeros((D, r), np.float32)},
                    "up_q": {"w": rng.uniform(-bound, bound, (r, D)).astype(np.float32)},
                    "down_v": {"w": np.zeros((D, r), np.float32)},
                    "up_v": {"w": rng.uniform(-bound, bound, (r, D)).astype(np.float32)},
                }
        layers.append(layer)

    pos_w = fold_weight_norm_conv1d(
        t2j(sd["encoder.pos_conv.0.weight_g"]), t2j(sd["encoder.pos_conv.0.weight_v"])
    )  # (O, I/g, K)
    params: Dict[str, Any] = {
        "video_frontend": _resnet(sd, "feature_extractor_video.resnet"),
        "video_proj": linear_from_torch(sd, "feature_extractor_video.proj"),
        "audio_proj": linear_from_torch(sd, "feature_extractor_audio.proj"),
        "fuse_norm": layer_norm_from_torch(sd, "layer_norm"),
        "post_extract_proj": linear_from_torch(sd, "post_extract_proj"),
        "pos_conv": {
            "w": pos_w.transpose(2, 1, 0),  # (K, I/g, O) for WIO
            "b": t2j(sd["encoder.pos_conv.0.bias"]),
        },
        "layers": stack_dicts(layers),
        "top_norm": layer_norm_from_torch(sd, "encoder.layer_norm"),
    }
    import jax

    out = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    # trainable LoRA masters convert straight from torch at f32 (a bf16
    # round trip would quantize them; matches convert_llm)
    if "lora" in params["layers"]:
        out["layers"]["lora"] = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, lora_dtype), params["layers"]["lora"]
        )
    return out
