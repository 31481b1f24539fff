"""Checkpoint converter round-trips: a reference-shaped torch state_dict
(synthetically built with the exact key layout of a trained Omni-AVSR
checkpoint) -> convert -> forward runs + structural assertions; plus orbax
save/restore/averaging."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import (
    AVHubertConfig,
    LLMConfig,
    LoRAConfig,
    OmniConfig,
    WhisperEncoderConfig,
)
from omni_avsr_tpu.convert.omni_ckpt import convert_omni_checkpoint, convert_projectors
from omni_avsr_tpu.data.tokenizer import synthetic_tokenizer
from omni_avsr_tpu.models.omni import OmniAVSR

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def _tiny_cfg():
    return OmniConfig(
        llm=LLMConfig(
            vocab_size=254, hidden_size=64, intermediate_size=128, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16,
            lora=LoRAConfig(rank_divisor=8, alpha=4, task_specific=True, v_out_divisor=2),
        ),
        whisper=WhisperEncoderConfig(hidden_size=32, num_layers=1, num_heads=2, ffn_dim=64),
        avhubert=AVHubertConfig(
            encoder_embed_dim=48, encoder_layers=1, encoder_heads=4,
            encoder_ffn_dim=96, audio_feat_dim=26, lora_rank_divisor=16,
        ),
        downsample_ratio_audio=(4, 16),
        downsample_ratio_video=(2, 5),
        projector_intermediate_size=32,
    )


def _reference_state_dict(cfg: OmniConfig):
    """Builds a state dict with the key layout of the reference's
    `AVSR_LLMs.state_dict()` (tiny dims)."""
    torch.manual_seed(0)
    sd = {}

    # --- audio_encoder (HF whisper encoder layout)
    w = cfg.whisper
    sd["audio_encoder.conv1.weight"] = torch.randn(w.hidden_size, w.num_mel_bins, 3)
    sd["audio_encoder.conv1.bias"] = torch.randn(w.hidden_size)
    sd["audio_encoder.conv2.weight"] = torch.randn(w.hidden_size, w.hidden_size, 3)
    sd["audio_encoder.conv2.bias"] = torch.randn(w.hidden_size)
    sd["audio_encoder.embed_positions.weight"] = torch.randn(1500, w.hidden_size)
    for i in range(w.num_layers):
        p = f"audio_encoder.layers.{i}"
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{p}.{ln}.weight"] = torch.ones(w.hidden_size)
            sd[f"{p}.{ln}.bias"] = torch.zeros(w.hidden_size)
        for proj in ("q_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = torch.randn(w.hidden_size, w.hidden_size) * 0.05
            sd[f"{p}.self_attn.{proj}.bias"] = torch.zeros(w.hidden_size)
        sd[f"{p}.self_attn.k_proj.weight"] = torch.randn(w.hidden_size, w.hidden_size) * 0.05
        sd[f"{p}.fc1.weight"] = torch.randn(w.ffn_dim, w.hidden_size) * 0.05
        sd[f"{p}.fc1.bias"] = torch.zeros(w.ffn_dim)
        sd[f"{p}.fc2.weight"] = torch.randn(w.hidden_size, w.ffn_dim) * 0.05
        sd[f"{p}.fc2.bias"] = torch.zeros(w.hidden_size)
    sd["audio_encoder.layer_norm.weight"] = torch.ones(w.hidden_size)
    sd["audio_encoder.layer_norm.bias"] = torch.zeros(w.hidden_size)

    # --- video_encoder (fairseq avhubert layout)
    a = cfg.avhubert
    D = a.encoder_embed_dim
    root = "video_encoder.feature_extractor_video.resnet"
    sd[f"{root}.frontend3D.0.weight"] = torch.randn(64, 1, 5, 7, 7) * 0.05
    for bn, c in ((f"{root}.frontend3D.1", 64),):
        sd[f"{bn}.weight"] = torch.ones(c)
        sd[f"{bn}.bias"] = torch.zeros(c)
        sd[f"{bn}.running_mean"] = torch.zeros(c)
        sd[f"{bn}.running_var"] = torch.ones(c)
    sd[f"{root}.frontend3D.2.weight"] = torch.full((64,), 0.25)
    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for li, (cin, cout) in enumerate(chans, start=1):
        for b in range(2):
            p = f"{root}.trunk.layer{li}.{b}"
            c_in = cin if b == 0 else cout
            sd[f"{p}.conv1.weight"] = torch.randn(cout, c_in, 3, 3) * 0.05
            sd[f"{p}.conv2.weight"] = torch.randn(cout, cout, 3, 3) * 0.05
            for bn in ("bn1", "bn2"):
                sd[f"{p}.{bn}.weight"] = torch.ones(cout)
                sd[f"{p}.{bn}.bias"] = torch.zeros(cout)
                sd[f"{p}.{bn}.running_mean"] = torch.zeros(cout)
                sd[f"{p}.{bn}.running_var"] = torch.ones(cout)
            sd[f"{p}.relu1.weight"] = torch.full((cout,), 0.25)
            sd[f"{p}.relu2.weight"] = torch.full((cout,), 0.25)
            if b == 0 and (cin != cout):
                sd[f"{p}.downsample.0.weight"] = torch.randn(cout, cin, 1, 1) * 0.05
                sd[f"{p}.downsample.1.weight"] = torch.ones(cout)
                sd[f"{p}.downsample.1.bias"] = torch.zeros(cout)
                sd[f"{p}.downsample.1.running_mean"] = torch.zeros(cout)
                sd[f"{p}.downsample.1.running_var"] = torch.ones(cout)
    sd["video_encoder.feature_extractor_video.proj.weight"] = torch.randn(D, 512) * 0.05
    sd["video_encoder.feature_extractor_video.proj.bias"] = torch.zeros(D)
    sd["video_encoder.feature_extractor_audio.proj.weight"] = torch.randn(D, a.audio_feat_dim) * 0.05
    sd["video_encoder.feature_extractor_audio.proj.bias"] = torch.zeros(D)
    sd["video_encoder.layer_norm.weight"] = torch.ones(2 * D)
    sd["video_encoder.layer_norm.bias"] = torch.zeros(2 * D)
    sd["video_encoder.post_extract_proj.weight"] = torch.randn(D, 2 * D) * 0.05
    sd["video_encoder.post_extract_proj.bias"] = torch.zeros(D)
    sd["video_encoder.encoder.pos_conv.0.bias"] = torch.zeros(D)
    sd["video_encoder.encoder.pos_conv.0.weight_g"] = torch.ones(1, 1, a.conv_pos)
    sd["video_encoder.encoder.pos_conv.0.weight_v"] = torch.randn(
        D, D // a.conv_pos_groups, a.conv_pos) * 0.05
    for i in range(a.encoder_layers):
        p = f"video_encoder.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = torch.randn(D, D) * 0.05
            sd[f"{p}.self_attn.{proj}.bias"] = torch.zeros(D)
        r = round(D / a.lora_rank_divisor)
        sd[f"{p}.self_attn.lora_down_Q.weight"] = torch.randn(r, D) * 0.01
        sd[f"{p}.self_attn.lora_up_Q.weight"] = torch.randn(D, r) * 0.01
        sd[f"{p}.self_attn.lora_down_V.weight"] = torch.randn(r, D) * 0.01
        sd[f"{p}.self_attn.lora_up_V.weight"] = torch.randn(D, r) * 0.01
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{p}.{ln}.weight"] = torch.ones(D)
            sd[f"{p}.{ln}.bias"] = torch.zeros(D)
        sd[f"{p}.fc1.weight"] = torch.randn(a.encoder_ffn_dim, D) * 0.05
        sd[f"{p}.fc1.bias"] = torch.zeros(a.encoder_ffn_dim)
        sd[f"{p}.fc2.weight"] = torch.randn(D, a.encoder_ffn_dim) * 0.05
        sd[f"{p}.fc2.bias"] = torch.zeros(D)
    sd["video_encoder.encoder.layer_norm.weight"] = torch.ones(D)
    sd["video_encoder.encoder.layer_norm.bias"] = torch.zeros(D)

    # --- projectors: per-rate ModuleList WITHOUT LN (the avg-pool quirk);
    # stack mode widens fc1's input to enc_dim * rate (`modeling:75-77,160`)
    l = cfg.llm
    stack = cfg.compression_mode == "stack"
    for name, rates, enc_dim in (("audio_proj", cfg.audio_rates, w.hidden_size),
                                 ("video_proj", cfg.video_rates, D)):
        for i, rate in enumerate(rates):
            in_dim = enc_dim * rate if stack else enc_dim
            sd[f"{name}.{i}.0.weight"] = torch.randn(cfg.projector_intermediate_size, in_dim) * 0.05
            sd[f"{name}.{i}.0.bias"] = torch.zeros(cfg.projector_intermediate_size)
            sd[f"{name}.{i}.2.weight"] = torch.randn(l.hidden_size, cfg.projector_intermediate_size) * 0.05
            sd[f"{name}.{i}.2.bias"] = torch.zeros(l.hidden_size)

    # --- llm (HF llama + modality LoRA dicts)
    h = l.hidden_size
    sd["llm.model.embed_tokens.weight"] = torch.randn(l.vocab_size, h) * 0.02
    for i in range(l.num_layers):
        p = f"llm.model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = torch.ones(h)
        sd[f"{p}.post_attention_layernorm.weight"] = torch.ones(h)
        sd[f"{p}.self_attn.q_proj.weight"] = torch.randn(l.q_dim, h) * 0.05
        sd[f"{p}.self_attn.k_proj.weight"] = torch.randn(l.kv_dim, h) * 0.05
        sd[f"{p}.self_attn.v_proj.weight"] = torch.randn(l.kv_dim, h) * 0.05
        sd[f"{p}.self_attn.o_proj.weight"] = torch.randn(h, l.q_dim) * 0.05
        r = l.lora.bottleneck(h)
        v_out = h // l.lora.v_out_divisor
        for m in ("audio", "video", "audiovisual"):
            sd[f"{p}.self_attn.lora_down_Q.{m}.weight"] = torch.randn(r, h) * 0.01
            sd[f"{p}.self_attn.lora_up_Q.{m}.weight"] = torch.randn(h, r) * 0.01
            sd[f"{p}.self_attn.lora_down_V.{m}.weight"] = torch.randn(r, h) * 0.01
            sd[f"{p}.self_attn.lora_up_V.{m}.weight"] = torch.randn(v_out, r) * 0.01
        if l.lora.shared:  # hybrid: shared adapters alongside task dicts
            sd[f"{p}.self_attn.lora_down_Q_shared.weight"] = torch.randn(r, h) * 0.01
            sd[f"{p}.self_attn.lora_up_Q_shared.weight"] = torch.randn(h, r) * 0.01
            sd[f"{p}.self_attn.lora_down_V_shared.weight"] = torch.randn(r, h) * 0.01
            sd[f"{p}.self_attn.lora_up_V_shared.weight"] = torch.randn(v_out, r) * 0.01
        sd[f"{p}.mlp.gate_proj.weight"] = torch.randn(l.intermediate_size, h) * 0.05
        sd[f"{p}.mlp.up_proj.weight"] = torch.randn(l.intermediate_size, h) * 0.05
        sd[f"{p}.mlp.down_proj.weight"] = torch.randn(h, l.intermediate_size) * 0.05
    sd["llm.model.norm.weight"] = torch.ones(h)
    return sd


def test_omni_checkpoint_round_trip():
    cfg = _tiny_cfg()
    sd = _reference_state_dict(cfg)
    params = convert_omni_checkpoint(sd, cfg, frozen_dtype=jnp.float32)
    assert set(params) == {"llm", "whisper", "avhubert", "audio_proj", "video_proj"}
    # per-rate projectors detected, LN correctly absent (quirk)
    assert set(params["audio_proj"]["per_rate"]) == {"r4", "r16"}
    assert "ln" not in params["audio_proj"]["per_rate"]["r4"]
    # LoRA dicts per modality landed
    assert set(params["llm"]["layers"]["lora"]) == {"audio", "video", "audiovisual"}
    # avhubert LoRA landed
    assert "lora" in params["avhubert"]["layers"]

    # converted tree must run the full three-task forward
    model = OmniAVSR(cfg, synthetic_tokenizer("llama", base_vocab=254 - 7))
    from tests.test_omni import make_batch

    batch = make_batch(model)
    losses = model.train_losses(params, batch, 4, 2, audio_trim_len=50, remat=False)
    assert all(bool(jnp.isfinite(x)) for x in losses.values())

    # structural match with init_params
    init = model.init_params(jax.random.PRNGKey(0), frozen_dtype=jnp.float32)
    assert jax.tree_util.tree_structure(init) == jax.tree_util.tree_structure(params)


def test_projector_ln_detection():
    sd = {
        "audio_proj.0.weight": torch.randn(8, 4), "audio_proj.0.bias": torch.zeros(8),
        "audio_proj.2.weight": torch.randn(6, 8), "audio_proj.2.bias": torch.zeros(6),
        "audio_proj.3.weight": torch.ones(6), "audio_proj.3.bias": torch.zeros(6),
    }
    p = convert_projectors(sd, "audio_proj", (4,))
    assert "single" in p and "ln" in p["single"]


def test_checkpoint_save_restore_average(tmp_path):
    import optax

    from omni_avsr_tpu.train.checkpoint import (
        average_last_n,
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from omni_avsr_tpu.train.state import TrainState, create_train_state

    tx = optax.adamw(1e-3)
    trainable = {"a": {"w": jnp.ones((4, 4))}, "b": {"w": jnp.zeros((2,))}}
    state = create_train_state(trainable, tx)
    ckpt_dir = str(tmp_path / "ck")
    for step, val in [(1, 1.0), (2, 2.0), (3, 3.0)]:
        s = state._replace(
            step=jnp.int32(step),
            trainable=jax.tree_util.tree_map(lambda x: x * 0 + val, state.trainable),
        )
        save_checkpoint(ckpt_dir, step, s, keep=10)
    assert latest_checkpoint(ckpt_dir).endswith("step_00000003")
    restored = restore_checkpoint(latest_checkpoint(ckpt_dir), state)
    assert float(restored.trainable["a"]["w"][0, 0]) == 3.0
    avg = average_last_n(ckpt_dir, state, 2)  # mean of 2.0, 3.0
    np.testing.assert_allclose(np.asarray(avg["a"]["w"]), 2.5)
    # GC: keep=1 leaves only the newest
    save_checkpoint(ckpt_dir, 4, state, keep=1)
    from omni_avsr_tpu.train.checkpoint import list_checkpoints

    assert len(list_checkpoints(ckpt_dir)) == 1


def test_orbax_trainable_round_trip_into_full_params(tmp_path):
    """Train-style checkpoint (TrainState w/ trainable only) -> build_params
    merge: trained leaves land in the full tree, frozen towers preserved."""
    import optax

    from omni_avsr_tpu.train.checkpoint import restore_trainable, save_checkpoint
    from omni_avsr_tpu.train.state import create_train_state, merge_params, split_params
    from omni_avsr_tpu.data.tokenizer import synthetic_tokenizer
    from omni_avsr_tpu.models.omni import OmniAVSR

    cfg = _tiny_cfg()
    model = OmniAVSR(cfg, synthetic_tokenizer("llama", base_vocab=254 - 7))
    params = model.init_params(jax.random.PRNGKey(0), frozen_dtype=jnp.float32)
    pred = model.trainable_predicate()
    trainable, frozen = split_params(params, pred)
    # mark the trained values so we can recognise them after the round trip
    trainable = jax.tree_util.tree_map(lambda x: x * 0 + 7.0, trainable)
    state = create_train_state(trainable, optax.adamw(1e-3))

    ckpt_dir = str(tmp_path / "ck")
    save_checkpoint(ckpt_dir, 5, state, keep=2)

    from omni_avsr_tpu.train.checkpoint import latest_checkpoint

    restored = restore_trainable(latest_checkpoint(ckpt_dir))
    merged = merge_params(
        jax.tree_util.tree_map(jnp.asarray, restored), params
    )
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)
    # trained leaves carry the marker; frozen leaves untouched
    assert float(merged["audio_proj"]["per_rate"]["r4"]["fc1"]["w"][0, 0]) == 7.0
    np.testing.assert_array_equal(
        np.asarray(merged["whisper"]["conv1"]["w"]),
        np.asarray(params["whisper"]["conv1"]["w"]),
    )
