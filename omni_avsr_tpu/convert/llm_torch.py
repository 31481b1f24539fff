"""HF Llama / Qwen2 state_dict -> omni_avsr_tpu LLM params.

Covers:
  - base HF checkpoints (`model.layers.N...`, `model.embed_tokens.weight`,
    `lm_head.weight` when untied)
  - the reference's LoRA keys added by `Llama_LoRA.py`/`Qwen_LoRA.py`:
    `model.layers.N.self_attn.lora_{down,up}_{Q,V}[.<modality>].weight`
    and `_shared` variants — per-modality ModuleDicts map to our
    {"lora": {modality: {...}}} trees.

A trained Omni checkpoint stores the whole `AVSR_LLMs` state_dict; use
`convert/omni_ckpt.py` to split it into llm/whisper/avhubert/projector parts
first, then this converter for the `llm.` subtree.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np
import jax.numpy as jnp

from ..config import LLMConfig, MODALITIES
from ..models.common import Params
from .common import linear_from_torch, rms_norm_from_torch, stack_dicts, t2j


def _lora_adapter(sd: Mapping[str, Any], attn: str, suffix: str = "") -> Dict[str, Any]:
    return {
        "down_q": linear_from_torch(sd, f"{attn}.lora_down_Q{suffix}", bias=False),
        "up_q": linear_from_torch(sd, f"{attn}.lora_up_Q{suffix}", bias=False),
        "down_v": linear_from_torch(sd, f"{attn}.lora_down_V{suffix}", bias=False),
        "up_v": linear_from_torch(sd, f"{attn}.lora_up_V{suffix}", bias=False),
    }


def convert_llm(
    sd: Mapping[str, Any],
    cfg: LLMConfig,
    dtype=jnp.bfloat16,
    lora_dtype=jnp.float32,
) -> Params:
    """Convert an HF (or reference-LoRA-extended) causal-LM state_dict.

    Keys may start with `model.` (HF *ForCausalLM) — both accepted.
    """
    if not any(k.startswith("model.") for k in sd):
        sd = {f"model.{k}" if not k.startswith("lm_head") else k: v for k, v in sd.items()}

    has_bias = cfg.attention_bias
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        attn = f"{p}.self_attn"
        layer: Dict[str, Any] = {
            "input_norm": rms_norm_from_torch(sd, f"{p}.input_layernorm"),
            "post_attn_norm": rms_norm_from_torch(sd, f"{p}.post_attention_layernorm"),
            "attn": {
                "q": linear_from_torch(sd, f"{attn}.q_proj", bias=has_bias),
                "k": linear_from_torch(sd, f"{attn}.k_proj", bias=has_bias),
                "v": linear_from_torch(sd, f"{attn}.v_proj", bias=has_bias),
                "o": linear_from_torch(sd, f"{attn}.o_proj", bias=False),
            },
            "mlp": {
                "gate": linear_from_torch(sd, f"{p}.mlp.gate_proj", bias=False),
                "up": linear_from_torch(sd, f"{p}.mlp.up_proj", bias=False),
                "down": linear_from_torch(sd, f"{p}.mlp.down_proj", bias=False),
            },
        }
        if cfg.lora is not None:
            if cfg.lora.task_specific:
                if f"{attn}.lora_down_Q.audio.weight" in sd:
                    layer["lora"] = {
                        m: _lora_adapter(sd, attn, f".{m}") for m in MODALITIES
                    }
                else:  # fresh init expected upstream; here zero-init down
                    layer["lora"] = {
                        m: _fresh_lora(cfg, seed=i * 4 + j)
                        for j, m in enumerate(MODALITIES)
                    }
                if cfg.lora.shared:
                    if f"{attn}.lora_down_Q_shared.weight" in sd:
                        layer["lora_shared"] = _lora_adapter(sd, attn, "_shared")
                    else:
                        layer["lora_shared"] = _fresh_lora(cfg, seed=10000 + i)
            else:
                if f"{attn}.lora_down_Q.weight" in sd:
                    layer["lora"] = _lora_adapter(sd, attn)
                else:
                    layer["lora"] = _fresh_lora(cfg, seed=i)
        layers.append(layer)

    params: Dict[str, Any] = {
        "embed": {"w": t2j(sd["model.embed_tokens.weight"])},
        "layers": stack_dicts(layers),
        "final_norm": rms_norm_from_torch(sd, "model.norm"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": t2j(sd["lm_head.weight"]).T}

    import jax

    out = {}
    for k, v in params.items():
        out[k] = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), v)
    # LoRA adapters train: convert them straight from the torch values at
    # lora_dtype (NOT via the frozen dtype — a bf16 round trip would quantize
    # the trainable master weights)
    if cfg.lora is not None:
        for key in ("lora", "lora_shared"):
            if key in params["layers"]:
                out["layers"][key] = jax.tree_util.tree_map(
                    lambda x: jnp.asarray(x, lora_dtype), params["layers"][key]
                )
    return out


def _fresh_lora(cfg: LLMConfig, seed: int) -> Dict[str, Any]:
    rng = np.random.RandomState(seed)
    h = cfg.hidden_size
    r = cfg.lora.bottleneck(h)
    v_out = h // cfg.lora.v_out_divisor
    bound_q = np.sqrt(1.0 / r)
    return {
        "down_q": {"w": np.zeros((h, r), np.float32)},
        "up_q": {"w": rng.uniform(-bound_q, bound_q, (r, h)).astype(np.float32)},
        "down_v": {"w": np.zeros((h, r), np.float32)},
        "up_v": {"w": rng.uniform(-bound_q, bound_q, (r, v_out)).astype(np.float32)},
    }
