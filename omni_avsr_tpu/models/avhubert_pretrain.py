"""AV-HuBERT masked-prediction pre-training (completeness component).

TPU re-design of the pre-training path (`av_hubert/avhubert/hubert.py:
443-560, 592-676` + `hubert_criterion.py:40-169`): span masking over fused
features, encoder forward, projection to an embedding space shared with
learned cluster ("unit") embeddings, cosine/dot logits with temperature,
and the masked/unmasked weighted cross-entropy criterion.

Static-shape span masking: fairseq computes numpy masks per batch on the
host (`utils.py compute_mask_indices`); here masks are computed on-device
with the same 'static' selection semantics (num_spans = floor(p*T/L + u),
uniform starts, fixed span length, overlaps allowed).

Modality dropout (`hubert.py:605-615`): with prob modality_dropout one
modality is zeroed before the concat fuse (audio zeroed with prob
audio_dropout within that event).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import AVHubertConfig
from .avhubert import avhubert_encoder
from .common import Params, init_linear, linear


def init_pretrain_head(
    rng: jax.Array,
    cfg: AVHubertConfig,
    num_classes: int,
    final_dim: int = 256,
    dtype=jnp.float32,
) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "mask_emb": jax.random.uniform(k1, (cfg.encoder_embed_dim,), dtype),
        "final_proj": init_linear(k2, cfg.encoder_embed_dim, final_dim, dtype=dtype),
        "label_embs": jax.random.normal(k3, (num_classes, final_dim), dtype),
    }


def compute_span_mask(
    rng: jax.Array,
    B: int,
    T: int,
    lengths: Optional[jax.Array],
    mask_prob: float,
    mask_length: int,
    min_masks: int = 2,
    max_spans: Optional[int] = None,
) -> jax.Array:
    """(B, T) bool span mask, fairseq 'static' selection semantics."""
    if max_spans is None:
        max_spans = max(int(mask_prob * T / mask_length + 1), min_masks) + 1
    k_n, k_s = jax.random.split(rng)
    lens = lengths if lengths is not None else jnp.full((B,), T)
    u = jax.random.uniform(k_n, (B,))
    n_spans = jnp.maximum(
        (mask_prob * lens.astype(jnp.float32) / mask_length + u).astype(jnp.int32),
        min_masks,
    )  # (B,)
    n_spans = jnp.minimum(n_spans, max_spans)
    span_max = jnp.maximum(lens - mask_length, 1)
    starts = (jax.random.uniform(k_s, (B, max_spans)) * span_max[:, None]).astype(jnp.int32)
    active = jnp.arange(max_spans)[None] < n_spans[:, None]
    idx = jnp.arange(T)[None, None]
    covered = (
        (idx >= starts[:, :, None])
        & (idx < (starts + mask_length)[:, :, None])
        & active[:, :, None]
    )
    mask = jnp.any(covered, axis=1)
    if lengths is not None:
        mask &= jnp.arange(T)[None] < lens[:, None]
    return mask


def compute_unit_logits(
    head: Params,
    x: jax.Array,  # (B, T, D) encoder output
    sim_type: str = "cosine",
    logit_temp: float = 0.1,
) -> jax.Array:
    """final_proj + cosine/dot similarity with unit embeddings / temperature
    (`hubert.py:577-590`)."""
    proj = linear(x, head["final_proj"])  # (B, T, F)
    emb = head["label_embs"].astype(proj.dtype)  # (V, F)
    if sim_type == "dot":
        logits = jnp.einsum("btf,vf->btv", proj, emb)
    else:
        nom = jnp.einsum("btf,vf->btv", proj, emb)
        denom = (
            jnp.linalg.norm(proj, axis=-1, keepdims=True)
            * jnp.linalg.norm(emb, axis=-1)[None, None]
        )
        logits = nom / jnp.maximum(denom, 1e-6)
    return logits / logit_temp


def avhubert_pretrain_loss(
    params: Params,  # avhubert encoder params
    head: Params,  # pretrain head params
    cfg: AVHubertConfig,
    video_feats: jax.Array,  # (B, T, D) per-modality features (post proj)
    audio_feats: jax.Array,  # (B, T, D)
    targets: jax.Array,  # (B, T) int32 cluster ids
    lengths: Optional[jax.Array],
    rng: jax.Array,
    mask_prob: float = 0.8,
    mask_length: int = 10,
    modality_dropout: float = 0.0,
    audio_dropout: float = 0.0,
    sim_type: str = "cosine",
    logit_temp: float = 0.1,
    pred_masked_weight: float = 1.0,
    pred_nomask_weight: float = 0.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Feature-masked prediction loss. Returns (loss, aux metrics)."""
    B, T, D = video_feats.shape
    k_mask, k_mod, k_aud = jax.random.split(rng, 3)

    # modality dropout before fuse (`hubert.py:605-615`)
    if modality_dropout > 0:
        drop = jax.random.uniform(k_mod, (B, 1, 1)) < modality_dropout
        drop_audio = jax.random.uniform(k_aud, (B, 1, 1)) < audio_dropout
        audio_feats = jnp.where(drop & drop_audio, 0.0, audio_feats)
        video_feats = jnp.where(drop & ~drop_audio, 0.0, video_feats)

    fused = jnp.concatenate([audio_feats, video_feats], axis=-1)
    from ..ops.norms import layer_norm

    fn = params["fuse_norm"]
    fused = layer_norm(fused, fn["scale"], fn["bias"])
    feats = linear(fused, params["post_extract_proj"])  # (B, T, D)

    mask = compute_span_mask(k_mask, B, T, lengths, mask_prob, mask_length)
    feats = jnp.where(mask[..., None], head["mask_emb"].astype(feats.dtype), feats)

    x = avhubert_encoder(params, cfg, feats, lengths)
    logits = compute_unit_logits(head, x, sim_type, logit_temp).astype(jnp.float32)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]  # (B, T)
    valid = (
        jnp.arange(T)[None] < lengths[:, None] if lengths is not None
        else jnp.ones((B, T), bool)
    )
    m = mask & valid
    u = (~mask) & valid
    loss_m = jnp.sum(jnp.where(m, nll, 0.0)) / jnp.maximum(jnp.sum(m), 1)
    loss_u = jnp.sum(jnp.where(u, nll, 0.0)) / jnp.maximum(jnp.sum(u), 1)
    loss = pred_masked_weight * loss_m + pred_nomask_weight * loss_u
    acc_m = jnp.sum(jnp.where(m, (jnp.argmax(logits, -1) == targets), False)) / jnp.maximum(jnp.sum(m), 1)
    return loss, {"loss_masked": loss_m, "loss_unmasked": loss_u, "acc_masked": acc_m}
