"""Unified Omni model: three-task forward, matryoshka rates, trainable split,
and a few-step overfit smoke test (SURVEY.md §4b idiom)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import (
    AVHubertConfig,
    LLMConfig,
    LoRAConfig,
    OmniConfig,
    TrainConfig,
    WhisperEncoderConfig,
)
from omni_avsr_tpu.data.tokenizer import IGNORE_INDEX, synthetic_tokenizer
from omni_avsr_tpu.models.omni import OmniAVSR
from omni_avsr_tpu.train.optim import make_optimizer
from omni_avsr_tpu.train.state import create_train_state, make_train_step, split_params, merge_params


def tiny_omni(family="llama"):
    llm = LLMConfig(
        family=family, vocab_size=254, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_scaling_factor=32.0 if family == "llama" else None,
        attention_bias=(family == "qwen"),
        lora=LoRAConfig(rank_divisor=8, alpha=4, task_specific=True, v_out_divisor=2),
    )
    cfg = OmniConfig(
        llm_model=("meta-llama/Llama-3.2-1B" if family == "llama" else "Qwen/Qwen2.5-0.5B"),
        llm=llm,
        whisper=WhisperEncoderConfig(hidden_size=32, num_layers=1, num_heads=2, ffn_dim=64),
        avhubert=AVHubertConfig(
            encoder_embed_dim=48, encoder_layers=1, encoder_heads=4,
            encoder_ffn_dim=96, audio_feat_dim=26, lora_rank_divisor=16,
        ),
        downsample_ratio_audio=(4, 16),
        downsample_ratio_video=(2, 5),
        projector_intermediate_size=32,
    )
    tok = synthetic_tokenizer(family, base_vocab=254 - 7)
    return OmniAVSR(cfg, tok)


def make_batch(model, B=2, Tt=6, S=16000, Tv=8):
    tok = model.tok
    rng = np.random.RandomState(0)
    rows, labs = [], []
    for b in range(B):
        ids = tok.encode("hello world foo bar")[:Tt]
        ids = ids + [tok.pad_id] * (Tt - len(ids))
        lab = [i if i != tok.pad_id else IGNORE_INDEX for i in ids]
        rows.append(ids)
        labs.append(lab)
    return {
        "tokens": jnp.asarray(rows, jnp.int32),
        "labels": jnp.asarray(labs, jnp.int32),
        "audio": jnp.asarray(rng.randn(B, S).astype(np.float32) * 0.05),
        "audio_len": jnp.asarray([S, S // 2], jnp.int32),
        "video": jnp.asarray(rng.randn(B, Tv, 88, 88, 1).astype(np.float32) * 0.1),
        "video_len": jnp.asarray([Tv, Tv - 2], jnp.int32),
    }


@pytest.fixture(scope="module")
def model():
    return tiny_omni()


@pytest.fixture(scope="module")
def params(model):
    return model.init_params(jax.random.PRNGKey(0), frozen_dtype=jnp.float32)


def test_three_task_losses(model, params):
    batch = make_batch(model)
    losses = model.train_losses(
        params, batch, rate_audio=4, rate_video=2, audio_trim_len=50, remat=False
    )
    assert set(losses) == {"audio", "video", "audiovisual"}
    for m, l in losses.items():
        assert jnp.isfinite(l), m
    # matry weights: video weighted 1.5x
    assert model.cfg.matry_weights == (1.0, 1.5, 1.0)


def test_all_rate_combinations_compile(model, params):
    batch = make_batch(model)
    for ra in model.cfg.audio_rates:
        for rv in model.cfg.video_rates:
            losses = model.train_losses(
                params, batch, ra, rv, audio_trim_len=50, remat=False
            )
            assert all(jnp.isfinite(l) for l in losses.values()), (ra, rv)


def test_infer_prefix_shapes(model, params):
    batch = make_batch(model)
    D = model.cfg.llm.hidden_size
    trim = 50
    for modality, expect in [
        ("audio", 1 + 1 + trim // 4 + 1),  # bos + <audio> + feats + </audio>
        ("video", 1 + 1 + 8 // 2 + 1),
        ("audiovisual", 1 + (2 + trim // 4) + (2 + 8 // 2)),
    ]:
        emb = model.infer_prefix(
            params, batch, modality, rate_audio=4, rate_video=2, audio_trim_len=trim
        )
        P = len(model.prompt_ids[modality])
        assert emb.shape == (2, expect + P, D), modality


def test_qwen_variant():
    model = tiny_omni("qwen")
    params = model.init_params(jax.random.PRNGKey(1), frozen_dtype=jnp.float32)
    batch = make_batch(model)
    losses = model.train_losses(params, batch, 4, 2, audio_trim_len=50, remat=False)
    assert all(jnp.isfinite(l) for l in losses.values())
    emb = model.infer_prefix(params, batch, "audio", 4, 2, 50)
    # qwen: no BOS
    assert emb.shape[1] == 1 + 50 // 4 + 1 + len(model.prompt_ids["audio"])


def test_trainable_split(model, params):
    pred = model.trainable_predicate(("peft_llm", "lora_avhubert"))
    trainable, frozen = split_params(params, pred)
    from omni_avsr_tpu.models.common import tree_paths

    t_paths = [p for p, _ in tree_paths(trainable)]
    assert any(p.startswith("audio_proj") for p in t_paths)
    assert any(p.startswith("video_proj") for p in t_paths)
    assert any(".lora" in p and p.startswith("llm") for p in t_paths)
    assert any(".lora" in p and p.startswith("avhubert") for p in t_paths)
    f_paths = [p for p, _ in tree_paths(frozen)]
    assert not any("lora" in p for p in f_paths)
    assert not any("proj" in p and p.startswith(("audio_proj", "video_proj")) for p in f_paths)
    # merge inverts split
    merged = merge_params(trainable, frozen)
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)


def test_overfit_smoke(model, params):
    """A few optimizer steps on one batch must reduce the combined loss."""
    batch = make_batch(model)
    pred = model.trainable_predicate()
    trainable, frozen = split_params(params, pred)
    tx, _ = make_optimizer(TrainConfig(lr=5e-3, grad_clip=10.0, max_epochs=1), steps_per_epoch=50)

    def loss_fn(merged, batch):
        losses = model.train_losses(merged, batch, 4, 2, audio_trim_len=50, remat=False)
        return (losses["audio"] + losses["video"] + losses["audiovisual"]) / 3.0

    step = jax.jit(make_train_step(loss_fn, tx, compute_dtype=jnp.float32))
    state = create_train_state(trainable, tx)
    first = None
    for i in range(8):
        state, loss = step(state, frozen, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))


def test_infer_prefix_masked_counts(model, params):
    """Per-sample validity counts follow the reference trim rules exactly."""
    import numpy as np

    batch = make_batch(model)  # audio_len = [16000, 8000], video_len = [8, 6]
    emb, valid = model.infer_prefix_masked(
        params, batch, "audiovisual", rate_audio=4, rate_video=2, audio_trim_max=50
    )
    assert emb.shape[:2] == valid.shape
    v = np.asarray(valid)
    P_prompt = len(model.prompt_ids["audiovisual"])
    # layout: [bos][a_sos][A x 12][a_eos][v_sos][V x 4][v_eos][prompt]
    a_max, v_max = 50 // 4, 8 // 2
    assert emb.shape[1] == 1 + 1 + a_max + 1 + 1 + v_max + 1 + P_prompt
    # sample 0: trim=max(16000*50//16000,25)=50 -> 12 audio tokens; video 8//2=4
    # sample 1: trim=max(8000*50//16000,25)=25 -> 6 audio tokens; video 6//2=3
    n_audio = v[:, 2:2 + a_max].sum(axis=1)
    n_video = v[:, 2 + a_max + 2:2 + a_max + 2 + v_max].sum(axis=1)
    assert n_audio.tolist() == [12, 6]
    assert n_video.tolist() == [4, 3]
    # all delimiters/prompt/bos valid
    assert v[:, 0].all() and v[:, 1].all() and v[:, -P_prompt:].all()


def test_fused_task_forward_matches_unfused(model, params):
    """cfg.fused_task_forward: one stacked (3B, T_max) decoder program must
    give the SAME per-task losses as three separate forwards (padding is
    causally inert; labels pad with IGNORE_INDEX)."""
    import dataclasses

    batch = make_batch(model)
    ref = model.train_losses(params, batch, 4, 2, audio_trim_len=50,
                             train_mode=False, remat=False)
    fused_model = OmniAVSR(
        dataclasses.replace(model.cfg, fused_task_forward=True), model.tok)
    got = fused_model.train_losses(params, batch, 4, 2, audio_trim_len=50,
                                   train_mode=False, remat=False)
    for m in ref:
        np.testing.assert_allclose(float(got[m]), float(ref[m]),
                                   rtol=2e-3, atol=2e-3)


def test_fused_task_forward_grads_match(model, params):
    """Gradients through the fused forward equal the unfused ones (LoRA
    adapters of each task get exactly their own rows)."""
    import dataclasses

    batch = make_batch(model)
    fused_model = OmniAVSR(
        dataclasses.replace(model.cfg, fused_task_forward=True), model.tok)

    def loss_fn(mdl):
        def f(p):
            losses = mdl.train_losses(p, batch, 4, 2, audio_trim_len=50,
                                      train_mode=False, remat=False)
            return (losses["audio"] + losses["video"] + losses["audiovisual"]) / 3.0
        return f

    g_ref = jax.grad(loss_fn(model))(params)
    g_fused = jax.grad(loss_fn(fused_model))(params)
    la = g_ref["llm"]["layers"]["lora"]
    lb = g_fused["llm"]["layers"]["lora"]
    for m in ("audio", "video", "audiovisual"):
        np.testing.assert_allclose(
            np.asarray(lb[m]["down_q"]["w"]), np.asarray(la[m]["down_q"]["w"]),
            rtol=5e-3, atol=5e-4)


def test_span_loss_matches_full_sequence(model, params):
    """The label-span loss (lm_head + CE over only the text window) must
    equal the full-sequence computation exactly: IGNORE-labelled positions
    contribute zero to the CE sum and lm_head is row-independent."""
    from omni_avsr_tpu.models.llm import embed_tokens, llm_loss

    batch = make_batch(model)
    losses = model.train_losses(
        params, batch, rate_audio=4, rate_video=2, audio_trim_len=50,
        train_mode=False, remat=False,
    )
    dtype = jnp.bfloat16
    text_emb = embed_tokens(params["llm"], batch["tokens"], dtype)
    a = model.encode_audio(params, batch["audio"], batch["audio_len"], 4, 50).astype(dtype)
    v = model.encode_video(params, batch["video"], 2, train_mode=False).astype(dtype)
    for i, m in enumerate(("audio", "video", "audiovisual")):
        parts = {"audio": (a,), "video": (v,), "audiovisual": (a, v)}[m]
        embeds, lab, _ = model._assemble_task(params, m, parts, text_emb, batch["labels"])
        full = llm_loss(params["llm"], model.cfg.llm, embeds, lab, modality=m, remat=False)
        np.testing.assert_allclose(
            float(losses[m]), float(full) * model.cfg.matry_weights[i], rtol=1e-6)


def test_span_loss_matches_full_sequence_qwen():
    """Same exactness for the Qwen layout (prefix-first, no BOS: the span
    starts one position earlier)."""
    from omni_avsr_tpu.models.llm import embed_tokens, llm_loss

    model = tiny_omni("qwen")
    params = model.init_params(jax.random.PRNGKey(1), frozen_dtype=jnp.float32)
    batch = make_batch(model)
    losses = model.train_losses(
        params, batch, rate_audio=4, rate_video=2, audio_trim_len=50,
        train_mode=False, remat=False,
    )
    dtype = jnp.bfloat16
    text_emb = embed_tokens(params["llm"], batch["tokens"], dtype)
    a = model.encode_audio(params, batch["audio"], batch["audio_len"], 4, 50).astype(dtype)
    v = model.encode_video(params, batch["video"], 2, train_mode=False).astype(dtype)
    for i, m in enumerate(("audio", "video", "audiovisual")):
        parts = {"audio": (a,), "video": (v,), "audiovisual": (a, v)}[m]
        embeds, lab, _ = model._assemble_task(params, m, parts, text_emb, batch["labels"])
        full = llm_loss(params["llm"], model.cfg.llm, embeds, lab, modality=m, remat=False)
        np.testing.assert_allclose(
            float(losses[m]), float(full) * model.cfg.matry_weights[i], rtol=1e-6)
