"""AV-HuBERT encoder (video tower), frozen + runtime-injected LoRA.

TPU re-design of `av_hubert/avhubert/hubert.py:318-789` plus the patched
fairseq `TransformerEncoder` (`fairseq/models/wav2vec/wav2vec2.py:817-1040`)
and its LoRA attention (`fairseq/modules/multihead_attention.py:389-560`):

  video (B,T,88,88,1) -> ResNet3D -> Linear(512->D)          [video features]
  audio fbank (B,T,104) -> Linear(104->D)                    [audio features]
  video-only: audio features zero-filled (`hubert.py:704-709`)
  concat fuse (B,T,2D) -> LayerNorm -> post_extract_proj (2D->D)
  -> pos-conv (grouped k=128 conv, SamePad trim, GELU) residual
  -> N pre-LN transformer layers; LoRA deltas added to q/v *before* the
     1/sqrt(d) scaling (`multihead_attention.py:484-511`), scaling_lora = 2
  -> final LayerNorm (layer_norm_first)

The reference passes NO padding mask into `extract_finetune`
(`modeling_OmniAVSR.py:463`), so padded frames attend normally; we keep an
optional lengths mask but default to the same behaviour for parity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import AVHubertConfig
from ..ops.attention import dot_product_attention, padding_mask_from_lengths
from ..ops.norms import layer_norm
from .common import (
    Params,
    init_kaiming_linear,
    init_layer_norm,
    init_linear,
    init_zeros_linear,
    linear,
    stack_layers,
)
from .resnet3d import init_resnet3d, resnet3d_forward


def init_avhubert(rng: jax.Array, cfg: AVHubertConfig, dtype=jnp.float32) -> Params:
    D = cfg.encoder_embed_dim
    keys = jax.random.split(rng, cfg.encoder_layers + 8)

    def layer_init(k):
        ks = jax.random.split(k, 8)
        p = {
            "attn_norm": init_layer_norm(D, dtype),
            "attn": {
                "q": init_linear(ks[0], D, D, bias=True, dtype=dtype),
                "k": init_linear(ks[1], D, D, bias=True, dtype=dtype),
                "v": init_linear(ks[2], D, D, bias=True, dtype=dtype),
                "o": init_linear(ks[3], D, D, bias=True, dtype=dtype),
            },
            "final_norm": init_layer_norm(D, dtype),
            "fc1": init_linear(ks[4], D, cfg.encoder_ffn_dim, bias=True, dtype=dtype),
            "fc2": init_linear(ks[5], cfg.encoder_ffn_dim, D, bias=True, dtype=dtype),
        }
        if cfg.lora_rank_divisor:
            r = round(D / cfg.lora_rank_divisor)
            # zero down / kaiming up (`modeling_OmniAVSR.py:138-142`)
            p["lora"] = {
                "down_q": init_zeros_linear(D, r, dtype),
                "up_q": init_kaiming_linear(ks[6], r, D, dtype),
                "down_v": init_zeros_linear(D, r, dtype),
                "up_v": init_kaiming_linear(ks[7], r, D, dtype),
            }
        return p

    fuse_dim = 2 * D if cfg.modality_fuse == "concat" else D
    return {
        "video_frontend": init_resnet3d(keys[-1], cfg.resnet_relu_type, dtype),
        "video_proj": init_linear(keys[-2], 512, D, bias=True, dtype=dtype),
        "audio_proj": init_linear(keys[-3], cfg.audio_feat_dim, D, bias=True, dtype=dtype),
        "fuse_norm": init_layer_norm(fuse_dim, dtype),
        "post_extract_proj": init_linear(keys[-4], fuse_dim, D, bias=True, dtype=dtype),
        "pos_conv": {
            "w": jax.random.normal(
                keys[-5], (cfg.conv_pos, D // cfg.conv_pos_groups, D), dtype
            ) * (4.0 / (cfg.conv_pos * D)) ** 0.5,
            "b": jnp.zeros((D,), dtype),
        },
        "layers": stack_layers(tuple(layer_init(keys[i]) for i in range(cfg.encoder_layers))),
        "top_norm": init_layer_norm(D, dtype),
    }


def _pos_conv(x: jax.Array, p: Params, cfg: AVHubertConfig) -> jax.Array:
    """Grouped conv positional encoding; even kernel + SamePad trims the
    final timestep (`wav2vec2.py:826-840`).

    NB: a chunked shifted-window einsum reformulation was tried and measured
    SLOWER on v5e (2.79 vs 2.2 ms at B4 T128) — materialising the 128-tap
    windows costs more HBM traffic than XLA's grouped-conv lowering saves;
    the plain conv stays."""
    pad = cfg.conv_pos // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(1,),
        padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=cfg.conv_pos_groups,
    )
    y = y + p["b"].astype(x.dtype)
    y = y[:, :-1]  # SamePad for even kernel
    return jax.nn.gelu(y, approximate=False)


def _dropout(rng: Optional[jax.Array], x: jax.Array, rate: float) -> jax.Array:
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return x * keep.astype(x.dtype) / (1.0 - rate)


def _encoder_layer(
    layer: Params,
    cfg: AVHubertConfig,
    x: jax.Array,
    mask: Optional[jax.Array],
    rng: Optional[jax.Array] = None,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    B, T, D = x.shape
    H = cfg.encoder_heads
    hd = D // H
    assert cfg.layer_norm_first, "post-LN variant handled in avhubert_encoder"
    if rng is not None:
        k_attn, k_d1, k_d2, k_d3 = jax.random.split(rng, 4)
    else:
        k_attn = k_d1 = k_d2 = k_d3 = None
    h = layer_norm(x, layer["attn_norm"]["scale"], layer["attn_norm"]["bias"])
    attn = layer["attn"]
    q = linear(h, attn["q"])
    k = linear(h, attn["k"])
    v = linear(h, attn["v"])
    if "lora" in layer:
        lora = layer["lora"]
        q = q + linear(linear(h, lora["down_q"]), lora["up_q"]) * cfg.lora_scaling
        v = v + linear(linear(h, lora["down_v"]), lora["up_v"]) * cfg.lora_scaling
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, H, hd)
    v = v.reshape(B, T, H, hd)
    from ..ops.attention import FLASH_MIN_T_TRAIN, on_tpu

    # flash kernel fwd+bwd — attention-prob dropout runs IN-kernel
    # (position-hash mask), so the training configuration (fairseq keeps
    # attn dropout active in train mode) uses it too instead of falling
    # back to XLA. Gate tuned on-chip: benchmarks/attention_sweep.py.
    if on_tpu() and hd in (64, 128) and T >= FLASH_MIN_T_TRAIN:
        from ..ops.flash_attention_bwd import flash_attention_trainable

        rate, seed = 0.0, None
        if k_attn is not None and cfg.attention_dropout > 0.0:
            rate = cfg.attention_dropout
            seed = jax.random.randint(k_attn, (), 0, 2**31 - 1, dtype=jnp.int32)
        out = flash_attention_trainable(q, k, v, kv_lengths=lengths,
                                        dropout_rate=rate, dropout_seed=seed)
    else:
        out = dot_product_attention(
            q, k, v, mask=mask, dropout_rng=k_attn, dropout_rate=cfg.attention_dropout
        )
    out = _dropout(k_d1, linear(out.reshape(B, T, D), attn["o"]), cfg.dropout)
    x = x + out

    h = layer_norm(x, layer["final_norm"]["scale"], layer["final_norm"]["bias"])
    h = jax.nn.gelu(linear(h, layer["fc1"]), approximate=False)
    h = _dropout(k_d2, h, cfg.activation_dropout)
    x = x + _dropout(k_d3, linear(h, layer["fc2"]), cfg.dropout)
    return x


def avhubert_encoder(
    params: Params,
    cfg: AVHubertConfig,
    features: jax.Array,  # (B, T, D) post-extract features
    lengths: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    output_layer: Optional[int] = None,
) -> jax.Array:
    """rng enables train()-mode stochastics: dropouts + layerdrop
    (fairseq `TransformerEncoder.extract_features`, `wav2vec2.py:867-905`).

    output_layer (1-based, static) stops after that layer and skips the top
    layer_norm — the layer-N feature dump behind iterative k-means targets
    (`clustering/dump_hubert_feature.py:96-106`; `wav2vec2.py:45-51`: the top
    norm applies only when `layer is None`). Note the reference's PATCHED
    fairseq commented out the early break (`wav2vec2.py:878-886`), so its
    tree silently returns the FINAL layer; we implement the stock/intended
    stop-at-layer-N semantics the clustering recipe was written for."""
    x = features + _pos_conv(features, params["pos_conv"], cfg)
    mask = None
    if lengths is not None:
        mask = padding_mask_from_lengths(lengths, x.shape[1])[:, None, None, :]

    L = cfg.encoder_layers
    if output_layer is not None:
        assert 1 <= output_layer <= L, (output_layer, L)
        L = output_layer
        params = dict(params, layers=jax.tree_util.tree_map(
            lambda a: a[:L], params["layers"]))
    if rng is not None:
        k_in, k_layers = jax.random.split(rng)
        x = _dropout(k_in, x, cfg.dropout)
        layer_keys = jax.random.split(k_layers, L)
        drop_u = jax.random.uniform(jax.random.fold_in(rng, 7), (L,))
    else:
        layer_keys = jnp.zeros((L, 2), jnp.uint32)
        drop_u = jnp.ones((L,))

    def body(h, xs):
        layer, key, u = xs
        y = _encoder_layer(
            layer, cfg, h, mask, key if rng is not None else None, lengths=lengths
        )
        if rng is not None and cfg.layerdrop > 0.0:
            y = jnp.where(u > cfg.layerdrop, y, h)  # stochastic layer skip
        return y, None

    from .llm import maybe_remat

    x, _ = jax.lax.scan(
        maybe_remat(body),
        x,
        (params["layers"], layer_keys, drop_u),
    )
    if cfg.layer_norm_first and output_layer is None:
        tn = params["top_norm"]
        x = layer_norm(x, tn["scale"], tn["bias"])
    return x


def avhubert_extract_features(
    params: Params,
    cfg: AVHubertConfig,
    video: Optional[jax.Array],  # (B, T, H, W, 1)
    audio: Optional[jax.Array] = None,  # (B, T, feat_dim) fbank stacks
    train_mode: bool = False,
) -> jax.Array:
    """Modality feature extraction + zero-fill fuse (`hubert.py:695-728`)."""
    assert video is not None or audio is not None
    if video is not None:
        vf = resnet3d_forward(params["video_frontend"], video, train_mode)
        vfeat = linear(vf, params["video_proj"])
        B, T = vfeat.shape[:2]
    if audio is not None:
        afeat = linear(audio, params["audio_proj"])
        B, T = afeat.shape[:2]
    D = cfg.encoder_embed_dim
    if video is None:
        vfeat = jnp.zeros((B, T, D), afeat.dtype)
    if audio is None:
        afeat = jnp.zeros((B, T, D), vfeat.dtype)

    if cfg.modality_fuse == "concat":
        # fairseq fuses on the channel axis with audio first (`hubert.py:714`)
        feats = jnp.concatenate([afeat, vfeat], axis=-1)
    else:
        feats = afeat + vfeat
    fn = params["fuse_norm"]
    feats = layer_norm(feats, fn["scale"], fn["bias"])
    return linear(feats, params["post_extract_proj"])


def avhubert_encode(
    params: Params,
    cfg: AVHubertConfig,
    video: Optional[jax.Array],
    audio: Optional[jax.Array] = None,
    lengths: Optional[jax.Array] = None,
    train_mode: bool = False,
    rng: Optional[jax.Array] = None,
    output_layer: Optional[int] = None,
) -> jax.Array:
    """Full `extract_finetune` equivalent: (B, T, D) encoder output.
    Passing rng enables train()-mode dropout/layerdrop (reference trains the
    frozen encoder in train() mode). output_layer=N dumps layer-N features
    (`clustering/dump_hubert_feature.py:96-106`); see avhubert_encoder."""
    feats = avhubert_extract_features(params, cfg, video, audio, train_mode)
    if output_layer == 0:  # ret_conv: the fused post-projection features
        return feats
    if rng is not None and cfg.dropout_input > 0.0:
        k_in, rng = jax.random.split(rng)
        feats = _dropout(k_in, feats, cfg.dropout_input)
    return avhubert_encoder(params, cfg, feats, lengths, rng, output_layer)
