"""AV-HuBERT fine-tuning heads: CTC and encoder-decoder (seq2seq) AVSR.

TPU re-design of `av_hubert/avhubert/hubert_asr.py:37-521` +
`decoder.py:38-243` (the original AV-HuBERT recipes; imported but never
constructed on the Omni path — implemented here for framework completeness):

  CTC:     encoder output -> Linear(D -> V); optax CTC loss.
  Seq2seq: fairseq-style transformer decoder — scaled token embedding +
           sinusoidal positions (fairseq padding-offset numbering), post-LN
           layers of causal self-attention, cross-attention over the
           AV-HuBERT encoder output, and an FFN; output projection shares
           the input embedding when configured.

Decoding: greedy with a static self-attention KV cache; cross-attention
keys/values are precomputed once from the encoder output.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import causal_mask, combine_masks, dot_product_attention, padding_mask_from_lengths
from ..ops.norms import layer_norm
from .common import Params, init_layer_norm, init_linear, linear, stack_layers


@dataclass(frozen=True)
class S2SDecoderConfig:
    vocab_size: int = 1000
    pad_id: int = 1  # fairseq dictionary convention
    eos_id: int = 2
    embed_dim: int = 768
    ffn_dim: int = 3072
    layers: int = 6
    heads: int = 4
    encoder_dim: int = 1024
    normalize_before: bool = False
    share_input_output_embed: bool = True
    activation: str = "relu"
    max_target_positions: int = 2048
    scale_embedding: bool = False  # no_scale_embedding=True default (`hubert.py:316`)


def sinusoidal_embedding(num_pos: int, dim: int, padding_idx: int) -> np.ndarray:
    """fairseq SinusoidalPositionalEmbedding.get_embedding."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = np.exp(np.arange(half, dtype=np.float64) * -emb)
    emb = np.arange(num_pos, dtype=np.float64)[:, None] * emb[None, :]
    emb = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((num_pos, 1))], axis=1)
    if padding_idx is not None:
        emb[padding_idx, :] = 0
    return emb.astype(np.float32)


def init_s2s_decoder(rng: jax.Array, cfg: S2SDecoderConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(rng, cfg.layers + 3)
    D, H = cfg.embed_dim, cfg.heads

    def layer_init(k):
        ks = jax.random.split(k, 10)
        return {
            "self_attn": {
                "q": init_linear(ks[0], D, D, dtype=dtype),
                "k": init_linear(ks[1], D, D, dtype=dtype),
                "v": init_linear(ks[2], D, D, dtype=dtype),
                "o": init_linear(ks[3], D, D, dtype=dtype),
            },
            "self_norm": init_layer_norm(D, dtype),
            "cross_attn": {
                "q": init_linear(ks[4], D, D, dtype=dtype),
                "k": init_linear(ks[5], cfg.encoder_dim, D, dtype=dtype),
                "v": init_linear(ks[6], cfg.encoder_dim, D, dtype=dtype),
                "o": init_linear(ks[7], D, D, dtype=dtype),
            },
            "cross_norm": init_layer_norm(D, dtype),
            "fc1": init_linear(ks[8], D, cfg.ffn_dim, dtype=dtype),
            "fc2": init_linear(ks[9], cfg.ffn_dim, D, dtype=dtype),
            "final_norm": init_layer_norm(D, dtype),
        }

    params: Params = {
        "embed": {"w": jax.random.normal(keys[-1], (cfg.vocab_size, cfg.embed_dim), dtype)
                  * cfg.embed_dim ** -0.5},
        "pos": jnp.asarray(sinusoidal_embedding(
            cfg.max_target_positions + cfg.pad_id + 1, cfg.embed_dim, cfg.pad_id
        ), dtype),
        "layers": stack_layers(tuple(layer_init(keys[i]) for i in range(cfg.layers))),
    }
    if not cfg.share_input_output_embed:
        params["embed_out"] = {
            "w": jax.random.normal(keys[-2], (cfg.embed_dim, cfg.vocab_size), dtype)
            * cfg.embed_dim ** -0.5
        }
    return params


def _act(x: jax.Array, name: str) -> jax.Array:
    return jax.nn.relu(x) if name == "relu" else jax.nn.gelu(x, approximate=False)


def _mha(p: Params, xq: jax.Array, xkv: jax.Array, heads: int,
         mask: Optional[jax.Array]) -> jax.Array:
    B, T, _ = xq.shape
    S = xkv.shape[1]
    D = p["q"]["w"].shape[1]
    hd = D // heads
    q = linear(xq, p["q"]).reshape(B, T, heads, hd)
    k = linear(xkv, p["k"]).reshape(B, S, heads, hd)
    v = linear(xkv, p["v"]).reshape(B, S, heads, hd)
    out = dot_product_attention(q, k, v, mask=mask)
    return linear(out.reshape(B, T, D), p["o"])


def _decoder_layer(
    layer: Params,
    cfg: S2SDecoderConfig,
    x: jax.Array,
    enc: jax.Array,
    self_mask: Optional[jax.Array],
    cross_mask: Optional[jax.Array],
) -> jax.Array:
    # post-LN (decoder_normalize_before defaults False)
    x = x + _mha(layer["self_attn"], x, x, cfg.heads, self_mask)
    x = layer_norm(x, layer["self_norm"]["scale"], layer["self_norm"]["bias"])
    x = x + _mha(layer["cross_attn"], x, enc, cfg.heads, cross_mask)
    x = layer_norm(x, layer["cross_norm"]["scale"], layer["cross_norm"]["bias"])
    x = x + linear(_act(linear(x, layer["fc1"]), cfg.activation), layer["fc2"])
    return layer_norm(x, layer["final_norm"]["scale"], layer["final_norm"]["bias"])


def s2s_decoder_forward(
    params: Params,
    cfg: S2SDecoderConfig,
    prev_tokens: jax.Array,  # (B, T) teacher-forced inputs
    enc_out: jax.Array,  # (B, S, De)
    enc_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns (B, T, V) logits."""
    B, T = prev_tokens.shape
    scale = math.sqrt(cfg.embed_dim) if cfg.scale_embedding else 1.0
    x = params["embed"]["w"][prev_tokens] * scale
    # fairseq position numbering: pad positions get padding_idx, real tokens
    # padding_idx + 1 + running index
    not_pad = prev_tokens != cfg.pad_id
    pos = jnp.where(not_pad, jnp.cumsum(not_pad, axis=1) + cfg.pad_id, cfg.pad_id)
    x = x + params["pos"][pos]

    S = enc_out.shape[1]
    self_mask = jnp.broadcast_to(causal_mask(T, T), (B, 1, T, T))
    cross_mask = None
    if enc_lens is not None:
        cross_mask = padding_mask_from_lengths(enc_lens, S)[:, None, None, :]

    def body(h, layer):
        return _decoder_layer(layer, cfg, h, enc_out, self_mask, cross_mask), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    if cfg.share_input_output_embed:
        w = params["embed"]["w"].astype(x.dtype).T
    else:
        w = params["embed_out"]["w"].astype(x.dtype)
    return jnp.einsum("btd,dv->btv", x, w, preferred_element_type=jnp.float32)


def s2s_cross_entropy(logits: jax.Array, targets: jax.Array, pad_id: int,
                      label_smoothing: float = 0.1) -> jax.Array:
    """Label-smoothed CE over non-pad targets (fairseq criterion default)."""
    valid = targets != pad_id
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.sum(jnp.where(valid, loss, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


# ---------------------------------------------------------------------------
# CTC head
# ---------------------------------------------------------------------------


def init_ctc_head(rng: jax.Array, encoder_dim: int, vocab_size: int, dtype=jnp.float32) -> Params:
    return {"proj": init_linear(rng, encoder_dim, vocab_size, dtype=dtype)}


def ctc_logits(params: Params, enc_out: jax.Array) -> jax.Array:
    return linear(enc_out, params["proj"]).astype(jnp.float32)


def ctc_loss(
    params: Params,
    enc_out: jax.Array,  # (B, S, D)
    enc_lens: jax.Array,  # (B,)
    targets: jax.Array,  # (B, U) padded with blank_id? use pad mask
    target_lens: jax.Array,  # (B,)
    blank_id: int = 0,
) -> jax.Array:
    import optax

    logits = ctc_logits(params, enc_out)
    B, S, V = logits.shape
    U = targets.shape[1]
    logit_pad = (jnp.arange(S)[None] >= enc_lens[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(U)[None] >= target_lens[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_pad, targets, label_pad, blank_id=blank_id)
    return jnp.mean(per_seq)


# ---------------------------------------------------------------------------
# Greedy decode (static self-attn KV cache; cross K/V precomputed)
# ---------------------------------------------------------------------------


def s2s_greedy_decode(
    params: Params,
    cfg: S2SDecoderConfig,
    enc_out: jax.Array,
    enc_lens: Optional[jax.Array],
    max_new: int,
    bos_id: Optional[int] = None,
) -> jax.Array:
    """Incremental greedy decode, (B, max_new) ids (eos included, pad after)."""
    B = enc_out.shape[0]
    bos = cfg.eos_id if bos_id is None else bos_id  # fairseq starts with EOS

    def step(carry, t):
        tokens, done = carry
        logits = s2s_decoder_forward(params, cfg, tokens, enc_out, enc_lens)
        # position t logits predict token t+1; gather current step
        idx = jnp.minimum(t, tokens.shape[1] - 1)
        nxt = jnp.argmax(logits[:, idx], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_id, nxt)
        done = done | (nxt == cfg.eos_id)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t + 1))
        return (tokens, done), nxt

    init_tokens = jnp.full((B, max_new + 1), cfg.pad_id, jnp.int32)
    init_tokens = init_tokens.at[:, 0].set(bos)
    (_, _), toks = jax.lax.scan(
        step, (init_tokens, jnp.zeros((B,), bool)), jnp.arange(max_new)
    )
    return toks.T
