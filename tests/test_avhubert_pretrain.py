"""AV-HuBERT masked pre-training: mask semantics, logits, loss decreases."""

import numpy as np

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import AVHubertConfig
from omni_avsr_tpu.models.avhubert import init_avhubert
from omni_avsr_tpu.models.avhubert_pretrain import (
    avhubert_pretrain_loss,
    compute_span_mask,
    compute_unit_logits,
    init_pretrain_head,
)


def tiny_cfg():
    return AVHubertConfig(
        encoder_embed_dim=48, encoder_layers=2, encoder_heads=4,
        encoder_ffn_dim=96, audio_feat_dim=26, lora_rank_divisor=None,
    )


def test_span_mask_semantics():
    rng = jax.random.PRNGKey(0)
    lengths = jnp.array([50, 20])
    mask = compute_span_mask(rng, 2, 50, lengths, mask_prob=0.5, mask_length=5)
    m = np.asarray(mask)
    assert m.shape == (2, 50)
    assert m[1, 20:].sum() == 0  # nothing beyond the valid length
    assert m[0].sum() >= 2 * 5  # at least min_masks spans
    # spans are contiguous runs of length >= 1
    assert m.any()


def test_unit_logits_cosine_range():
    cfg = tiny_cfg()
    head = init_pretrain_head(jax.random.PRNGKey(1), cfg, num_classes=30, final_dim=16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 9, 48).astype(np.float32))
    logits = compute_unit_logits(head, x, "cosine", logit_temp=0.1)
    assert logits.shape == (2, 9, 30)
    # cosine / 0.1 bounded by +-10
    assert float(jnp.max(jnp.abs(logits))) <= 10.0 + 1e-4


def test_pretrain_loss_learns():
    """A few SGD steps on the head should reduce the masked-prediction loss."""
    cfg = tiny_cfg()
    enc = init_avhubert(jax.random.PRNGKey(0), cfg)
    head = init_pretrain_head(jax.random.PRNGKey(1), cfg, num_classes=12, final_dim=16)
    rng = np.random.RandomState(2)
    B, T, D = 2, 24, 48
    vf = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    af = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 12, (B, T)), jnp.int32)
    lengths = jnp.array([T, T - 4])

    def loss_fn(head, key):
        loss, aux = avhubert_pretrain_loss(
            enc, head, cfg, vf, af, targets, lengths, key,
            mask_prob=0.5, mask_length=4,
            modality_dropout=0.1, audio_dropout=0.5,
        )
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    key = jax.random.PRNGKey(3)
    first = None
    for i in range(12):
        loss, g = grad_fn(head, jax.random.fold_in(key, 0))  # fixed mask for overfit
        head = jax.tree_util.tree_map(lambda p, gi: p - 0.5 * gi, head, g)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))
