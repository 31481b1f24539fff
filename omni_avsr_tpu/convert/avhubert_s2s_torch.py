"""Fine-tuned AV-HuBERT seq2seq checkpoint -> framework params.

Layout per `av_hubert/avhubert/hubert_asr.py` (AVHubertSeq2Seq):
  encoder.w2v_model.*   the AV-HuBERT encoder (convert_avhubert)
  decoder.embed_tokens.weight / decoder.layers.N.{self_attn,encoder_attn,
  fc1,fc2,*_layer_norm}.* / decoder.embed_out (when untied)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

from ..config import AVHubertConfig
from ..models.avhubert_s2s import S2SDecoderConfig
from ..models.common import Params
from .avhubert_torch import convert_avhubert
from .common import layer_norm_from_torch, linear_from_torch, t2j


def _sub(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_s2s_decoder(
    sd: Mapping[str, Any], cfg: S2SDecoderConfig, dtype=jnp.float32
) -> Params:
    from ..models.avhubert_s2s import sinusoidal_embedding

    layers = []
    for i in range(cfg.layers):
        p = f"layers.{i}"
        layers.append({
            "self_attn": {
                "q": linear_from_torch(sd, f"{p}.self_attn.q_proj"),
                "k": linear_from_torch(sd, f"{p}.self_attn.k_proj"),
                "v": linear_from_torch(sd, f"{p}.self_attn.v_proj"),
                "o": linear_from_torch(sd, f"{p}.self_attn.out_proj"),
            },
            "self_norm": layer_norm_from_torch(sd, f"{p}.self_attn_layer_norm"),
            "cross_attn": {
                "q": linear_from_torch(sd, f"{p}.encoder_attn.q_proj"),
                "k": linear_from_torch(sd, f"{p}.encoder_attn.k_proj"),
                "v": linear_from_torch(sd, f"{p}.encoder_attn.v_proj"),
                "o": linear_from_torch(sd, f"{p}.encoder_attn.out_proj"),
            },
            "cross_norm": layer_norm_from_torch(sd, f"{p}.encoder_attn_layer_norm"),
            "fc1": linear_from_torch(sd, f"{p}.fc1"),
            "fc2": linear_from_torch(sd, f"{p}.fc2"),
            "final_norm": layer_norm_from_torch(sd, f"{p}.final_layer_norm"),
        })
    from .common import stack_dicts

    params: Dict[str, Any] = {
        "embed": {"w": t2j(sd["embed_tokens.weight"])},
        "pos": sinusoidal_embedding(
            cfg.max_target_positions + cfg.pad_id + 1, cfg.embed_dim, cfg.pad_id
        ),
        "layers": stack_dicts(layers),
    }
    if "embed_out" in sd:
        params["embed_out"] = {"w": t2j(sd["embed_out"]).T}
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)


def convert_avhubert_s2s(
    sd: Mapping[str, Any],
    enc_cfg: AVHubertConfig,
    dec_cfg: S2SDecoderConfig,
    dtype=jnp.bfloat16,
) -> Tuple[Params, Params]:
    """Returns (encoder_params, decoder_params)."""
    enc = convert_avhubert(_sub(sd, "encoder.w2v_model."), enc_cfg, dtype)
    dec = convert_s2s_decoder(_sub(sd, "decoder."), dec_cfg, dtype)
    return enc, dec
