"""Train-step component breakdown (real chip): ms, GFLOPs and MFU per stage.

Times, each as its own jitted program over the same batch:
  full        - the complete 3-task train step (grad + AdamW)
  fwd         - 3-task loss forward only (no grad)
  encoders    - augmentation + both towers + compression + projection
  aug         - on-device augmentation pipelines alone
  logmel      - Whisper log-mel frontend alone
  whisper     - log-mel + Whisper encoder + trim (the audio tower)
  resnet      - ResNet3D video frontend alone
  avhubert    - full video tower (ResNet3D + 24L transformer)
The (full - fwd) gap is backward+optimizer; (fwd - encoders) is the three
LLM task forwards + losses.

FLOPs come from XLA's cost analysis of each compiled program (static
shapes, so this IS the analytic count: convs, attention and MLPs all
enumerated by the compiler). MFU = flops / (time * peak); peak defaults to
TPU v5e bf16 (197 TFLOP/s), override with OMNI_PEAK_TFLOPS. Sub-millisecond
stages are dispatch-floor-bound (~0.75 ms/call on this relay) — their MFU
underestimates the kernel itself.

  python benchmarks/train_breakdown.py [batch] [frames]
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
    float(jnp.sum(jax.tree.leaves(out)[0]))  # compile + sync (axon: fetch)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def _flops(jitted, *args, **kwargs):
    """Total FLOPs of the compiled program per XLA cost analysis."""
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import _batch, _flagship
    from omni_avsr_tpu.config import TrainConfig
    from omni_avsr_tpu.models.avhubert import avhubert_encode
    from omni_avsr_tpu.models.resnet3d import resnet3d_forward
    from omni_avsr_tpu.models.whisper import whisper_encode
    from omni_avsr_tpu.ops.audio_frontend import (
        log_mel_spectrogram,
        whisper_token_len,
    )
    from omni_avsr_tpu.ops.augment import audio_pipeline, video_pipeline
    from omni_avsr_tpu.train.engine import OmniEngine

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    model = _flagship(tiny=False)
    cfg_over = {}
    if os.environ.get("OMNI_WHISPER_INPUT") == "bucket":
        cfg_over["whisper_input_mode"] = "bucket"
    if os.environ.get("OMNI_FUSED3", "") not in ("", "0"):
        cfg_over["fused_task_forward"] = True
    if cfg_over:
        import dataclasses

        from omni_avsr_tpu.models.omni import OmniAVSR

        model = OmniAVSR(dataclasses.replace(model.cfg, **cfg_over), model.tok)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(lr=1e-3), 100.0, seed=0)
    batch = {k: jnp.asarray(v) for k, v in
             _batch(model, B=B, frames=frames, token_len=24).items()}
    trim = int(((whisper_token_len(frames * 640) + 24) // 25) * 25)
    rng = jax.random.PRNGKey(0)
    mel_frames = (2 * trim if model.cfg.whisper_input_mode == "bucket"
                  else 3000)

    # fresh non-donating jits (the engine's own train step donates its state,
    # which makes repeated timing awkward)
    step_fn = engine._make_step(is_train=True)
    full_jit = jax.jit(step_fn, static_argnames=("rate_a", "rate_v", "trim_len"))

    eval_fn = engine._make_step(is_train=False)
    fwd_jit = jax.jit(eval_fn, static_argnames=("rate_a", "rate_v", "trim_len"))

    @jax.jit
    def encoders(params, batch, rng):
        kv, ka = jax.random.split(rng)
        proc = dict(batch)
        proc["video"] = video_pipeline(kv, batch["video"], batch["video_len"], train=True)
        proc["audio"] = audio_pipeline(ka, batch["audio"], batch["audio_len"], train=True)
        a = model.encode_audio(params, proc["audio"], batch["audio_len"], 4, trim)
        v = model.encode_video(params, proc["video"], 2, train_mode=True, rng=rng)
        return jnp.sum(a.astype(jnp.float32)) + jnp.sum(v.astype(jnp.float32))

    @jax.jit
    def aug(batch, rng):
        kv, ka = jax.random.split(rng)
        v = video_pipeline(kv, batch["video"], batch["video_len"], train=True)
        a = audio_pipeline(ka, batch["audio"], batch["audio_len"], train=True)
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(a)

    @jax.jit
    def logmel(batch):
        mel = log_mel_spectrogram(batch["audio"], batch["audio_len"],
                                  num_frames=mel_frames)
        return jnp.sum(mel)

    @jax.jit
    def whisper_tower(params, batch):
        mel = log_mel_spectrogram(batch["audio"], batch["audio_len"],
                                  num_frames=mel_frames)
        enc = whisper_encode(params["whisper"], model.cfg.whisper,
                             mel.astype(jnp.bfloat16))
        return jnp.sum(enc[:, :trim].astype(jnp.float32))

    @jax.jit
    def resnet(params, batch, rng):
        v = video_pipeline(rng, batch["video"], batch["video_len"], train=True)
        f = resnet3d_forward(params["avhubert"]["video_frontend"],
                             v.astype(jnp.bfloat16), train_mode=True)
        return jnp.sum(f.astype(jnp.float32))

    @jax.jit
    def avhubert(params, batch, rng):
        kv, kd = jax.random.split(rng)
        v = video_pipeline(kv, batch["video"], batch["video_len"], train=True)
        enc = avhubert_encode(params["avhubert"], model.cfg.avhubert,
                              v.astype(jnp.bfloat16), train_mode=True, rng=kd)
        return jnp.sum(enc.astype(jnp.float32))

    merged = engine.merged_params()
    stages = {}

    def record(name, t_ms, flops):
        mfu = (flops / (t_ms * 1e-3) / (PEAK_TFLOPS * 1e12) * 100.0
               if flops and t_ms > 0 else None)
        stages[name] = {
            "ms": round(t_ms, 1),
            "gflops": round(flops / 1e9, 1) if flops else None,
            "mfu_pct": round(mfu, 1) if mfu is not None else None,
        }

    record("aug", _time(aug, batch, rng), _flops(aug, batch, rng))
    record("logmel", _time(logmel, batch), _flops(logmel, batch))
    record("whisper", _time(whisper_tower, merged, batch),
           _flops(whisper_tower, merged, batch))
    record("resnet", _time(resnet, merged, batch, rng),
           _flops(resnet, merged, batch, rng))
    record("avhubert", _time(avhubert, merged, batch, rng),
           _flops(avhubert, merged, batch, rng))
    record("encoders", _time(encoders, merged, batch, rng),
           _flops(encoders, merged, batch, rng))

    fwd_call = lambda s, f, b, r: fwd_jit(s, f, b, r, rate_a=4, rate_v=2,
                                          trim_len=trim)[0]
    full_call = lambda s, f, b, r: full_jit(s, f, b, r, rate_a=4, rate_v=2,
                                            trim_len=trim)[1]
    t_fwd = _time(fwd_call, engine.state, engine.frozen, batch, rng)
    t_full = _time(full_call, engine.state, engine.frozen, batch, rng)
    f_fwd = _flops(fwd_jit, engine.state, engine.frozen, batch, rng,
                   rate_a=4, rate_v=2, trim_len=trim)
    f_full = _flops(full_jit, engine.state, engine.frozen, batch, rng,
                    rate_a=4, rate_v=2, trim_len=trim)
    record("fwd", t_fwd, f_fwd)
    record("full", t_full, f_full)
    record("llm3_fwd", t_fwd - stages["encoders"]["ms"],
           (f_fwd - _flops(encoders, merged, batch, rng)) if f_fwd else 0)
    record("bwd_opt", t_full - t_fwd, (f_full - f_fwd) if f_full else 0)

    print(json.dumps({
        "batch": B, "frames": frames, "whisper_mode": model.cfg.whisper_input_mode,
        "peak_tflops": PEAK_TFLOPS, "stages": stages,
    }, indent=2))


if __name__ == "__main__":
    main()
