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
# Incremental decoding: cross K/V precomputed once, self-attn KV cached
# ---------------------------------------------------------------------------


def s2s_precompute_cross(params: Params, cfg: S2SDecoderConfig, enc_out: jax.Array):
    """Per-layer cross-attention K/V from the encoder output:
    two (L, B, S, H, hd) arrays."""
    B, S, _ = enc_out.shape
    H = cfg.heads
    hd = cfg.embed_dim // H

    def per_layer(carry, layer):
        k = linear(enc_out, layer["cross_attn"]["k"]).reshape(B, S, H, hd)
        v = linear(enc_out, layer["cross_attn"]["v"]).reshape(B, S, H, hd)
        return carry, (k, v)

    _, (ks, vs) = jax.lax.scan(per_layer, None, params["layers"])
    return ks, vs


def _s2s_decode_step(
    params: Params,
    cfg: S2SDecoderConfig,
    tok: jax.Array,  # (B,) current input token ids
    t: jax.Array,  # scalar step (0-based position of `tok`)
    self_k: jax.Array,  # (L, B, N, H, hd)
    self_v: jax.Array,
    cross_k: jax.Array,  # (L, B/beams, S, H, hd) — shared across beams
    cross_v: jax.Array,
    cross_mask: Optional[jax.Array],  # (B/beams, 1, 1, S)
    beams: int = 1,
):
    """One incremental decode step. When beams > 1 the batch axis of `tok`
    and the self-attn cache is (B*beams) while the cross K/V keeps the bare
    batch axis: all beams of a sample attend ONE copy of the encoder
    keys/values (the beam axis rides the attention query-time dim), so the
    encoder KV is never replicated per beam in HBM — the s2s analogue of the
    LLM SplitCache shared prefix."""
    B = tok.shape[0]
    H = cfg.heads
    D = cfg.embed_dim
    hd = D // H
    scale = math.sqrt(D) if cfg.scale_embedding else 1.0
    x = params["embed"]["w"][tok][:, None] * scale  # (B,1,D)
    # position numbering: real token at running index t -> pad_id + 1 + t
    x = x + params["pos"][cfg.pad_id + 1 + t][None, None]
    N = self_k.shape[2]
    self_mask = (jnp.arange(N) <= t)[None, None, None, :]

    def body(x, xs):
        layer, sk, sv, ck, cv = xs
        sa = layer["self_attn"]
        q = linear(x, sa["q"]).reshape(B, 1, H, hd)
        k = linear(x, sa["k"]).reshape(B, 1, H, hd)
        v = linear(x, sa["v"]).reshape(B, 1, H, hd)
        sk = jax.lax.dynamic_update_slice(sk, k, (0, t, 0, 0))
        sv = jax.lax.dynamic_update_slice(sv, v, (0, t, 0, 0))
        out = dot_product_attention(q, sk, sv, mask=self_mask)
        x = x + linear(out.reshape(B, 1, D), sa["o"])
        x = layer_norm(x, layer["self_norm"]["scale"], layer["self_norm"]["bias"])

        ca = layer["cross_attn"]
        if beams == 1:
            q = linear(x, ca["q"]).reshape(B, 1, H, hd)
            out = dot_product_attention(q, ck, cv, mask=cross_mask)
        else:
            # fold the beam axis into the query-time dim: (Bb, K, H, hd)
            # queries against one shared (Bb, S, H, hd) K/V per sample
            q = linear(x, ca["q"]).reshape(B // beams, beams, H, hd)
            out = dot_product_attention(q, ck, cv, mask=cross_mask)
        x = x + linear(out.reshape(B, 1, D), ca["o"])
        x = layer_norm(x, layer["cross_norm"]["scale"], layer["cross_norm"]["bias"])
        x = x + linear(_act(linear(x, layer["fc1"]), cfg.activation), layer["fc2"])
        x = layer_norm(x, layer["final_norm"]["scale"], layer["final_norm"]["bias"])
        return x, (sk, sv)

    x, (self_k, self_v) = jax.lax.scan(
        body, x, (params["layers"], self_k, self_v, cross_k, cross_v)
    )
    if cfg.share_input_output_embed:
        w = params["embed"]["w"].astype(x.dtype).T
    else:
        w = params["embed_out"]["w"].astype(x.dtype)
    logits = jnp.einsum("bd,dv->bv", x[:, 0], w, preferred_element_type=jnp.float32)
    return logits, self_k, self_v


def s2s_beam_decode(
    params: Params,
    cfg: S2SDecoderConfig,
    enc_out: jax.Array,
    enc_lens: Optional[jax.Array],
    max_new: int,
    num_beams: int,
    length_penalty: float = 1.0,
    bos_id: Optional[int] = None,
) -> jax.Array:
    """Beam search over the s2s decoder, sharing the generic HF-semantics
    beam core (decode/decoding.py::beam_loop) with the LLM path — the
    framework's replacement for fairseq's SequenceGenerator
    (`av_hubert/avhubert/sequence_generator.py`)."""
    from ..decode.decoding import beam_loop
    from ..ops.attention import padding_mask_from_lengths

    B, S, _ = enc_out.shape
    K = num_beams
    H = cfg.heads
    hd = cfg.embed_dim // H
    L = cfg.layers
    bos = cfg.eos_id if bos_id is None else bos_id
    cross_k, cross_v = s2s_precompute_cross(params, cfg, enc_out)
    cross_mask = (
        padding_mask_from_lengths(enc_lens, S)[:, None, None, :]
        if enc_lens is not None else None
    )
    self_k = jnp.zeros((L, B, max_new + 1, H, hd), enc_out.dtype)
    self_v = jnp.zeros_like(self_k)
    logits0, self_k, self_v = _s2s_decode_step(
        params, cfg, jnp.full((B,), bos, jnp.int32), jnp.int32(0),
        self_k, self_v, cross_k, cross_v, cross_mask,
    )
    # tile the per-beam self-attn cache only; cross K/V stays ONE copy per
    # sample (shared across beams inside _s2s_decode_step, like the LLM
    # SplitCache shared prefix) — at K=15 this removes 15x of the per-step
    # encoder-KV HBM traffic and 15x of its residency
    sk = jnp.repeat(self_k, K, axis=1)
    sv = jnp.repeat(self_v, K, axis=1)

    def step_fn(state, new_tok, flat_idx, t):
        sk, sv = state
        sk, sv = sk[:, flat_idx], sv[:, flat_idx]
        logits, sk, sv = _s2s_decode_step(
            params, cfg, new_tok.reshape(B * K), t + 1, sk, sv,
            cross_k, cross_v, cross_mask, beams=K,
        )
        return logits.reshape(B, K, cfg.vocab_size), (sk, sv)

    return beam_loop(
        init_logits=logits0, state=(sk, sv), step_fn=step_fn,
        num_beams=K, vocab_size=cfg.vocab_size, max_new=max_new,
        eos_id=cfg.eos_id, pad_id=cfg.pad_id, length_penalty=length_penalty,
    )


def s2s_greedy_decode(
    params: Params,
    cfg: S2SDecoderConfig,
    enc_out: jax.Array,
    enc_lens: Optional[jax.Array],
    max_new: int,
    bos_id: Optional[int] = None,
) -> jax.Array:
    """KV-cached incremental greedy decode with early exit:
    (B, max_new) ids (eos included, pad after)."""
    from ..ops.attention import padding_mask_from_lengths

    B, S, _ = enc_out.shape
    H = cfg.heads
    hd = cfg.embed_dim // H
    L = cfg.layers
    bos = cfg.eos_id if bos_id is None else bos_id  # fairseq starts with EOS
    cross_k, cross_v = s2s_precompute_cross(params, cfg, enc_out)
    cross_mask = (
        padding_mask_from_lengths(enc_lens, S)[:, None, None, :]
        if enc_lens is not None else None
    )
    self_k = jnp.zeros((L, B, max_new + 1, H, hd), enc_out.dtype)
    self_v = jnp.zeros_like(self_k)
    tokens0 = jnp.full((B, max_new), cfg.pad_id, jnp.int32)

    def cond(state):
        t, _, _, _, done, _ = state
        return (t < max_new) & ~jnp.all(done)

    def body(state):
        t, cur, sk, sv, done, tokens = state
        logits, sk, sv = _s2s_decode_step(
            params, cfg, cur, t, sk, sv, cross_k, cross_v, cross_mask
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_id, nxt)
        done = done | (nxt == cfg.eos_id)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t))
        return (t + 1, nxt, sk, sv, done, tokens)

    _, _, _, _, _, tokens = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.full((B,), bos, jnp.int32), self_k, self_v,
         jnp.zeros((B,), bool), tokens0),
    )
    return tokens
