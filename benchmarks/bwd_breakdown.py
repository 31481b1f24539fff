"""Backward-pass attribution (real chip): which grad dominates bwd_opt?

train_breakdown.py reports (full - fwd) as one opaque "bwd_opt" number.
This splits it by taking gradients of isolated sub-losses w.r.t. exactly the
parameters that train in the full step:

  g_enc     - grad of a scalar over the ENCODER outputs w.r.t. projectors +
              AV-HuBERT LoRA (video-tower backward + projector wgrads)
  g_llm3    - grad of the 3-task span CE w.r.t. LLM LoRA, with the encoder
              outputs held constant (decoder backward only)
  g_full    - grad of the real combined loss w.r.t. all trainables
  opt       - AdamW update alone (grads precomputed)

Each is its own jitted program over the same batch; FLOPs from XLA cost
analysis; MFU against peak bf16 (OMNI_PEAK_TFLOPS, default v5e 197).

  OMNI_WHISPER_INPUT=bucket python benchmarks/bwd_breakdown.py [batch] [frames]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

PEAK_TFLOPS = float(os.environ.get("OMNI_PEAK_TFLOPS", "197"))


def _time(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def _flops(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import _batch, _flagship
    from omni_avsr_tpu.config import MODALITIES, TrainConfig
    from omni_avsr_tpu.models.llm import embed_tokens, llm_span_stats
    from omni_avsr_tpu.ops.audio_frontend import whisper_token_len
    from omni_avsr_tpu.train.engine import OmniEngine
    from omni_avsr_tpu.train.state import merge_params

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    model = _flagship(tiny=os.environ.get("OMNI_BREAKDOWN_TINY") == "1")
    if os.environ.get("OMNI_WHISPER_INPUT") == "bucket":
        import dataclasses

        from omni_avsr_tpu.models.omni import OmniAVSR

        model = OmniAVSR(dataclasses.replace(model.cfg,
                                             whisper_input_mode="bucket"),
                         model.tok)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(lr=1e-3), 100.0, seed=0)
    batch = {k: jnp.asarray(v) for k, v in
             _batch(model, B=B, frames=frames, token_len=24).items()}
    trim = int(((whisper_token_len(frames * 640) + 24) // 25) * 25)
    rng = jax.random.PRNGKey(0)
    cfg = model.cfg

    state, frozen = engine.state, engine.frozen

    def merged_of(trainable, frozen):
        t_cast = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), trainable)
        return merge_params(t_cast, frozen)

    from omni_avsr_tpu.ops.augment import audio_pipeline, video_pipeline

    # ---- encoder-side grad: scalar over a/v features, grads hit projectors
    # + AV-HuBERT LoRA (the only trainables below the LLM)
    @jax.jit
    def g_enc(trainable, frozen, batch, rng):
        kv, ka = jax.random.split(rng)
        vid = video_pipeline(kv, batch["video"], batch["video_len"], train=True)
        aud = audio_pipeline(ka, batch["audio"], batch["audio_len"], train=True)

        def f(tr):
            p = merged_of(tr, frozen)
            a = model.encode_audio(p, aud, batch["audio_len"], 4, trim)
            v = model.encode_video(p, vid, 2, train_mode=True, rng=rng)
            return jnp.sum(a.astype(jnp.float32)) + jnp.sum(v.astype(jnp.float32))

        return jax.grad(f)(trainable)

    # ---- decoder-side grad: 3-task span CE with constant encoder features
    p0 = engine.merged_params()

    @jax.jit
    def consts(p0, batch, rng):
        kv, ka = jax.random.split(rng)
        vid = video_pipeline(kv, batch["video"], batch["video_len"], train=False)
        aud = audio_pipeline(ka, batch["audio"], batch["audio_len"], train=False)
        a = model.encode_audio(p0, aud, batch["audio_len"], 4, trim)
        v = model.encode_video(p0, vid, 2, train_mode=False)
        return a.astype(jnp.bfloat16), v.astype(jnp.bfloat16)

    a_const, v_const = jax.block_until_ready(consts(p0, batch, rng))

    @jax.jit
    def g_llm3(trainable, frozen, batch, a, v):
        def f(tr):
            p = merged_of(tr, frozen)
            text_emb = embed_tokens(p["llm"], batch["tokens"], jnp.bfloat16)
            task_specific = bool(cfg.llm.lora and cfg.llm.lora.task_specific)
            total = 0.0
            for m in MODALITIES:
                parts = {"audio": (a,), "video": (v,), "audiovisual": (a, v)}[m]
                embeds, lab, span = model._assemble_task(
                    p, m, parts, text_emb, batch["labels"])
                tt, cc = llm_span_stats(
                    p["llm"], cfg.llm, embeds, lab, span,
                    modality=m if task_specific else None)
                total = total + jnp.sum(tt) / jnp.maximum(jnp.sum(cc), 1)
            return total / 3.0

        return jax.grad(f)(trainable)

    # ---- full grad + optimizer
    loss_step = engine._make_step(is_train=True)
    full_jit = jax.jit(loss_step, static_argnames=("rate_a", "rate_v", "trim_len"))
    eval_step = engine._make_step(is_train=False)
    fwd_jit = jax.jit(eval_step, static_argnames=("rate_a", "rate_v", "trim_len"))

    @jax.jit
    def g_full(trainable, frozen, batch, rng):
        k_aug, k_drop = jax.random.split(rng)
        kv, ka = jax.random.split(k_aug)
        proc = dict(batch)
        proc["video"] = video_pipeline(kv, batch["video"], batch["video_len"], train=True)
        proc["audio"] = audio_pipeline(ka, batch["audio"], batch["audio_len"], train=True)

        def f(tr):
            p = merged_of(tr, frozen)
            losses = model.train_losses(
                p, proc, 4, 2, trim, train_mode=True, dropout_rng=k_drop)
            return (losses["audio"] + losses["video"] + losses["audiovisual"]) / 3.0

        return jax.grad(f)(trainable)

    grads = jax.block_until_ready(g_full(state.trainable, frozen, batch, rng))

    @jax.jit
    def opt_only(grads, opt_state, trainable):
        updates, opt_state = engine.tx.update(grads, opt_state, trainable)
        import optax

        return optax.apply_updates(trainable, updates), opt_state

    stages = {}

    def record(name, t_ms, flops):
        mfu = (flops / (t_ms * 1e-3) / (PEAK_TFLOPS * 1e12) * 100.0
               if flops and t_ms > 0 else None)
        stages[name] = {"ms": round(t_ms, 1),
                        "gflops": round(flops / 1e9, 1) if flops else None,
                        "mfu_pct": round(mfu, 1) if mfu is not None else None}

    # ---- LLM-backward sub-attribution (VERDICT r3 item 5) -----------------
    # fwd-only value: bwd cost = g_llm3 - this
    @jax.jit
    def llm3_fwd(trainable, frozen, batch, a, v):
        def f(tr):
            p = merged_of(tr, frozen)
            text_emb = embed_tokens(p["llm"], batch["tokens"], jnp.bfloat16)
            task_specific = bool(cfg.llm.lora and cfg.llm.lora.task_specific)
            total = 0.0
            for m in MODALITIES:
                parts = {"audio": (a,), "video": (v,), "audiovisual": (a, v)}[m]
                embeds, lab, span = model._assemble_task(
                    p, m, parts, text_emb, batch["labels"])
                tt, cc = llm_span_stats(
                    p["llm"], cfg.llm, embeds, lab, span,
                    modality=m if task_specific else None)
                total = total + jnp.sum(tt) / jnp.maximum(jnp.sum(cc), 1)
            return total / 3.0

        return f(trainable)

    # dgrad-only chain: differentiate wrt the ENCODER FEATURES with LoRA
    # constant — same activation-gradient sweep, zero LoRA wgrads.
    # (g_llm3 - g_llm3_dgrad) ~= the LoRA wgrad contractions' cost.
    @jax.jit
    def g_llm3_dgrad(trainable, frozen, batch, a, v):
        p = merged_of(trainable, frozen)
        text_emb = embed_tokens(p["llm"], batch["tokens"], jnp.bfloat16)
        task_specific = bool(cfg.llm.lora and cfg.llm.lora.task_specific)

        def f(av):
            a_, v_ = av
            total = 0.0
            for m in MODALITIES:
                parts = {"audio": (a_,), "video": (v_,),
                         "audiovisual": (a_, v_)}[m]
                embeds, lab, span = model._assemble_task(
                    p, m, parts, text_emb, batch["labels"])
                tt, cc = llm_span_stats(
                    p["llm"], cfg.llm, embeds, lab, span,
                    modality=m if task_specific else None)
                total = total + jnp.sum(tt) / jnp.maximum(jnp.sum(cc), 1)
            return total / 3.0

        return jax.grad(f)((a, v))

    record("g_enc", _time(g_enc, state.trainable, frozen, batch, rng),
           _flops(g_enc, state.trainable, frozen, batch, rng))
    record("g_llm3", _time(g_llm3, state.trainable, frozen, batch, a_const, v_const),
           _flops(g_llm3, state.trainable, frozen, batch, a_const, v_const))
    record("llm3_fwd", _time(llm3_fwd, state.trainable, frozen, batch,
                             a_const, v_const),
           _flops(llm3_fwd, state.trainable, frozen, batch, a_const, v_const))
    record("g_llm3_dgrad", _time(g_llm3_dgrad, state.trainable, frozen, batch,
                                 a_const, v_const),
           _flops(g_llm3_dgrad, state.trainable, frozen, batch,
                  a_const, v_const))
    # remat-policy ablation: maybe_remat reads OMNI_REMAT at TRACE time, so
    # each mode gets a fresh jit of the same python callable
    base_mode = os.environ.get("OMNI_REMAT", "dots")
    for mode in ("off", "full"):
        if mode == base_mode:
            continue
        os.environ["OMNI_REMAT"] = mode
        g_mode = jax.jit(g_llm3.__wrapped__)
        record(f"g_llm3_remat_{mode}",
               _time(g_mode, state.trainable, frozen, batch, a_const, v_const),
               _flops(g_mode, state.trainable, frozen, batch,
                      a_const, v_const))
    os.environ["OMNI_REMAT"] = base_mode
    record("g_full", _time(g_full, state.trainable, frozen, batch, rng),
           _flops(g_full, state.trainable, frozen, batch, rng))
    record("opt", _time(opt_only, grads, state.opt_state, state.trainable),
           _flops(opt_only, grads, state.opt_state, state.trainable))
    fwd_call = lambda s, f, b, r: fwd_jit(s, f, b, r, rate_a=4, rate_v=2,
                                          trim_len=trim)[0]
    full_call = lambda s, f, b, r: full_jit(s, f, b, r, rate_a=4, rate_v=2,
                                            trim_len=trim)[1]
    record("fwd", _time(fwd_call, state, frozen, batch, rng), 0)
    record("full_step", _time(full_call, state, frozen, batch, rng), 0)

    print(json.dumps({"batch": B, "frames": frames,
                      "whisper_mode": cfg.whisper_input_mode,
                      "stages": stages}, indent=2))


if __name__ == "__main__":
    main()
