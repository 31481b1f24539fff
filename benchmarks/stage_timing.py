"""On-device chained stage timings (no relay dispatch floor).

train_breakdown.py times each stage with 20 host dispatches — under the
axon relay every call carries a ~3 ms floor, which swamps sub-10 ms stages
and corrupts their MFU columns. Here every stage runs N iterations inside
ONE `lax.fori_loop` with a data dependency threaded through
`chain_iteration`, so the measurement is pure device time (the single
dispatch + fetch amortises to ~32/N ms).

  OMNI_WHISPER_INPUT=bucket python benchmarks/stage_timing.py [batch] [frames] [iters]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

PEAK_TFLOPS = float(os.environ.get("OMNI_PEAK_TFLOPS", "197"))


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import _batch, _flagship
    from omni_avsr_tpu.config import MODALITIES, TrainConfig
    from omni_avsr_tpu.models.avhubert import avhubert_encode
    from omni_avsr_tpu.models.llm import embed_tokens, llm_span_stats
    from omni_avsr_tpu.models.resnet3d import resnet3d_forward
    from omni_avsr_tpu.models.whisper import whisper_encode
    from omni_avsr_tpu.ops.audio_frontend import (
        log_mel_spectrogram,
        whisper_token_len,
    )
    from omni_avsr_tpu.ops.augment import audio_pipeline, video_pipeline
    from omni_avsr_tpu.train.engine import OmniEngine
    from omni_avsr_tpu.train.state import merge_params
    from omni_avsr_tpu.utils.profiling import chain_iteration

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    model = _flagship(tiny=False)
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
    mel_frames = 2 * trim if cfg.whisper_input_mode == "bucket" else 3000
    state, frozen = engine.state, engine.frozen
    merged = engine.merged_params()

    # preprocessed inputs (aug applied once — stage bodies time the towers)
    kv, ka = jax.random.split(rng)
    vid = jax.block_until_ready(video_pipeline(
        kv, batch["video"], batch["video_len"], train=True))
    aud = jax.block_until_ready(audio_pipeline(
        ka, batch["audio"], batch["audio_len"], train=True))
    pbatch = dict(batch, video=vid, audio=aud)

    def chained(body, *keys):
        """body(params_like, batch) -> scalar f32; returns ms/iter.
        Threads the loop dependency through EVERY listed input — a stage
        reading an unchained input is loop-invariant and XLA hoists it out,
        silently measuring nothing."""

        @jax.jit
        def loop(p, b):
            def it(i, acc):
                bb = b
                for key in keys:
                    bb = chain_iteration(bb, acc, key=key)
                return acc + body(p, bb)

            return jax.lax.fori_loop(0, N, it, jnp.float32(0.0))

        float(loop(merged, pbatch))  # compile + execute + fetch
        t0 = time.perf_counter()
        float(loop(merged, pbatch))
        return (time.perf_counter() - t0) / N * 1e3

    def body_logmel(p, b):
        return jnp.sum(log_mel_spectrogram(b["audio"], b["audio_len"],
                                           num_frames=mel_frames))

    def body_whisper(p, b):
        mel = log_mel_spectrogram(b["audio"], b["audio_len"],
                                  num_frames=mel_frames)
        enc = whisper_encode(p["whisper"], cfg.whisper, mel.astype(jnp.bfloat16))
        return jnp.sum(enc[:, :trim].astype(jnp.float32))

    def body_resnet(p, b):
        f = resnet3d_forward(p["avhubert"]["video_frontend"],
                             b["video"].astype(jnp.bfloat16), train_mode=True)
        return jnp.sum(f.astype(jnp.float32))

    def body_avhubert(p, b):
        enc = avhubert_encode(p["avhubert"], cfg.avhubert,
                              b["video"].astype(jnp.bfloat16),
                              train_mode=True, rng=rng)
        return jnp.sum(enc.astype(jnp.float32))

    def body_avhubert_eval(p, b):
        enc = avhubert_encode(p["avhubert"], cfg.avhubert,
                              b["video"].astype(jnp.bfloat16),
                              train_mode=False)
        return jnp.sum(enc.astype(jnp.float32))

    def body_llm3_fwd(p, b):
        text_emb = embed_tokens(p["llm"], b["tokens"], jnp.bfloat16)
        a = model.encode_audio(p, b["audio"], b["audio_len"], 4, trim).astype(jnp.bfloat16)
        v = model.encode_video(p, b["video"], 2, train_mode=True, rng=rng).astype(jnp.bfloat16)
        task_specific = bool(cfg.llm.lora and cfg.llm.lora.task_specific)
        total = 0.0
        for m in MODALITIES:
            parts = {"audio": (a,), "video": (v,), "audiovisual": (a, v)}[m]
            embeds, lab, span = model._assemble_task(p, m, parts, text_emb, b["labels"])
            tt, cc = llm_span_stats(p["llm"], cfg.llm, embeds, lab, span,
                                    modality=m if task_specific else None)
            total = total + jnp.sum(tt) / jnp.maximum(jnp.sum(cc), 1)
        return total / 3.0

    stages = {
        "logmel": chained(body_logmel, "audio"),
        "whisper": chained(body_whisper, "audio"),
        "resnet": chained(body_resnet, "video"),
        "avhubert_train": chained(body_avhubert, "video"),
        "avhubert_eval": chained(body_avhubert_eval, "video"),
        "fwd3": chained(body_llm3_fwd, "audio", "video"),
    }

    # full train-step grad, chained: thread the dependency through the batch
    def merged_of(tr, fz):
        t_cast = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), tr)
        return merge_params(t_cast, fz)

    @jax.jit
    def gloop(trainable, fz, b, key):
        def it(i, acc):
            bb = chain_iteration(chain_iteration(b, acc), acc, key="video")

            def f(tr):
                kv, ka = jax.random.split(key)
                proc = dict(bb)
                proc["video"] = video_pipeline(kv, bb["video"], bb["video_len"], train=True)
                proc["audio"] = audio_pipeline(ka, bb["audio"], bb["audio_len"], train=True)
                losses = model.train_losses(
                    merged_of(tr, fz), proc, 4, 2, trim,
                    train_mode=True, dropout_rng=key)
                return (losses["audio"] + losses["video"] + losses["audiovisual"]) / 3.0

            loss, grads = jax.value_and_grad(f)(trainable)
            # consume EVERY grad leaf — an unconsumed leaf's backward
            # subgraph is dead code and XLA deletes it from the measurement
            gsum = sum(jnp.sum(l).astype(jnp.float32)
                       for l in jax.tree_util.tree_leaves(grads))
            return acc + loss + gsum * 1e-30

        return jax.lax.fori_loop(0, N, it, jnp.float32(0.0))

    float(gloop(state.trainable, frozen, batch, rng))
    t0 = time.perf_counter()
    float(gloop(state.trainable, frozen, batch, rng))
    stages["fwd_bwd"] = (time.perf_counter() - t0) / N * 1e3

    # ---- analytic matmul FLOPs (NOT XLA cost analysis: it counts a
    # lax.scan body ONCE, so scanned towers under-count ~L-fold)
    def xformer_gflops(layers, tokens, d, d_ff, d_kv=None, T=None, heads=0):
        d_kv = d_kv if d_kv is not None else d
        per_tok = 2 * (d * (2 * d + 2 * d_kv) + 3 * d * d_ff)
        attn = 4 * tokens * (T or 0) * d  # qk^T + pv, per head-dim total
        return layers * (tokens * per_tok + attn) / 1e9

    Tw = trim  # whisper tokens post-conv
    wh = cfg.whisper
    gf = {
        "whisper": xformer_gflops(wh.num_layers, B * Tw, wh.hidden_size,
                                  wh.ffn_dim, T=Tw)
        + 2 * B * (2 * Tw) * 3 * 80 * wh.hidden_size / 1e9  # conv1
        + 2 * B * Tw * 3 * wh.hidden_size ** 2 / 1e9,  # conv2
        "avhubert_eval": 845.0 / 12 * B  # resnet (XLA-counted, per sample)
        + xformer_gflops(cfg.avhubert.encoder_layers, B * frames,
                         cfg.avhubert.encoder_embed_dim,
                         cfg.avhubert.encoder_ffn_dim, T=frames),
        "resnet": 845.0 / 12 * B,
    }
    L = cfg.llm
    Tllm = 0
    for m in MODALITIES:
        P = {"audio": Tw // 4 + 2, "video": frames // 2 + 2,
             "audiovisual": Tw // 4 + frames // 2 + 4}[m]
        Tllm += P + 10 + 24  # prompt ~10, text 24
    kv_d = L.num_kv_heads * L.head_dim
    gf["fwd3"] = (gf["whisper"] + gf["avhubert_eval"]
                  + xformer_gflops(L.num_layers, B * Tllm, L.hidden_size,
                                   L.intermediate_size, d_kv=kv_d,
                                   T=Tllm // 3)
                  + 2 * 3 * B * 23 * L.hidden_size * L.vocab_size / 1e9)

    out = {}
    for k, v in stages.items():
        g = gf.get(k)
        mfu = (g / (v * 1e-3) / (PEAK_TFLOPS * 1e3)) * 100 if g else None
        out[k] = {"ms": round(v, 2),
                  "analytic_gflops": round(g, 1) if g else None,
                  "mfu_pct": round(mfu, 1) if mfu else None}
    print(json.dumps({"batch": B, "frames": frames, "iters": N,
                      "whisper_mode": cfg.whisper_input_mode,
                      "stages": out}, indent=2))


if __name__ == "__main__":
    main()
