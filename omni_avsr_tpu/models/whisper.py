"""Whisper encoder (audio tower), frozen in Omni-AVSR.

Functional JAX re-design of HF `WhisperModel.encoder`
(used at `Omni_AVSR/modeling_OmniAVSR.py:59-62, 528-537`):

  mel (B, 3000, 80)
    -> gelu(conv1d k3 s1 p1) -> gelu(conv1d k3 s2 p1)   (B, 1500, D)
    -> + sinusoidal positions
    -> N x pre-LN transformer layer (MHA bias on q/v/out, none on k; GELU MLP)
    -> final LayerNorm

Layers are scan-stacked. Convs run in NWC layout (TPU-friendly). All matmuls
bf16 on the MXU with f32 softmax/LN accumulation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperEncoderConfig
from ..ops.attention import dot_product_attention
from ..ops.norms import layer_norm
from .common import Params, init_layer_norm, init_linear, layer_slice, linear, stack_layers


def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoid table (log-spaced, [sin | cos] concat)."""
    log_timescale_increment = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    """x: (B, T, Cin), w: (K, Cin, Cout), torch padding=1."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + b.astype(x.dtype)


def init_whisper_encoder(rng: jax.Array, cfg: WhisperEncoderConfig, dtype=jnp.float32) -> Params:
    D = cfg.hidden_size
    keys = jax.random.split(rng, cfg.num_layers + 4)

    def layer_init(k):
        ks = jax.random.split(k, 8)
        return {
            "attn_norm": init_layer_norm(D, dtype),
            "attn": {
                "q": init_linear(ks[0], D, D, bias=True, dtype=dtype),
                "k": init_linear(ks[1], D, D, bias=False, dtype=dtype),
                "v": init_linear(ks[2], D, D, bias=True, dtype=dtype),
                "o": init_linear(ks[3], D, D, bias=True, dtype=dtype),
            },
            "mlp_norm": init_layer_norm(D, dtype),
            "fc1": init_linear(ks[4], D, cfg.ffn_dim, bias=True, dtype=dtype),
            "fc2": init_linear(ks[5], cfg.ffn_dim, D, bias=True, dtype=dtype),
        }

    bound1 = float(np.sqrt(1.0 / (cfg.num_mel_bins * 3)))
    bound2 = float(np.sqrt(1.0 / (D * 3)))
    return {
        "conv1": {
            "w": jax.random.uniform(keys[-4], (3, cfg.num_mel_bins, D), dtype, -bound1, bound1),
            "b": jnp.zeros((D,), dtype),
        },
        "conv2": {
            "w": jax.random.uniform(keys[-3], (3, D, D), dtype, -bound2, bound2),
            "b": jnp.zeros((D,), dtype),
        },
        "pos_embed": jnp.asarray(sinusoidal_positions(cfg.max_source_positions, D), dtype),
        "layers": stack_layers(tuple(layer_init(keys[i]) for i in range(cfg.num_layers))),
        "final_norm": init_layer_norm(D, dtype),
    }


def _use_pallas() -> bool:
    """The whisper tower is fully frozen (no grads flow into it), so the
    forward-only Pallas flash kernel applies — 1.4-1.6x over XLA attention
    at these shapes on v5e. CPU tests keep the XLA path."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _encoder_layer(layer: Params, cfg: WhisperEncoderConfig, x: jax.Array) -> jax.Array:
    B, T, D = x.shape
    H = cfg.num_heads
    hd = D // H
    h = layer_norm(x, layer["attn_norm"]["scale"], layer["attn_norm"]["bias"], cfg.layer_norm_eps)
    attn = layer["attn"]
    q = linear(h, attn["q"]).reshape(B, T, H, hd)
    k = linear(h, attn["k"]).reshape(B, T, H, hd)
    v = linear(h, attn["v"]).reshape(B, T, H, hd)
    if _use_pallas() and T >= 512 and hd in (64, 128):
        from ..ops.flash_attention import flash_attention

        out = flash_attention(q, k, v)
    else:
        out = dot_product_attention(q, k, v)  # bidirectional, no mask
    x = x + linear(out.reshape(B, T, D), attn["o"])

    h = layer_norm(x, layer["mlp_norm"]["scale"], layer["mlp_norm"]["bias"], cfg.layer_norm_eps)
    h = jax.nn.gelu(linear(h, layer["fc1"]), approximate=False)
    x = x + linear(h, layer["fc2"])
    return x


def whisper_encode(
    params: Params,
    cfg: WhisperEncoderConfig,
    mel: jax.Array,  # (B, 3000, n_mels)
    remat: bool = False,
) -> jax.Array:
    """Returns (B, 1500, D) hidden states."""
    x = jax.nn.gelu(_conv1d(mel, params["conv1"]["w"], params["conv1"]["b"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["conv2"]["w"], params["conv2"]["b"], 2), approximate=False)
    T = x.shape[1]
    x = x + params["pos_embed"][:T].astype(x.dtype)

    def body(h, layer):
        return _encoder_layer(layer, cfg, h), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, x, params["layers"])
    fn = params["final_norm"]
    return layer_norm(x, fn["scale"], fn["bias"], cfg.layer_norm_eps)
