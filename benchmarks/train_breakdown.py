"""Train-step component breakdown (real chip): where do the milliseconds go?

Times, each as its own jitted program over the same batch:
  full      - the complete 3-task train step (grad + AdamW)
  fwd       - 3-task loss forward only (no grad)
  encoders  - augmentation + both towers + compression + projection
  aug       - on-device augmentation pipelines alone
The (full - fwd) gap is backward+optimizer; (fwd - encoders) is the three
LLM task forwards + losses.

  python benchmarks/train_breakdown.py [batch] [frames]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _time(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # compile + sync (axon: fetch)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import _batch, _flagship
    from omni_avsr_tpu.config import TrainConfig
    from omni_avsr_tpu.ops.audio_frontend import whisper_token_len
    from omni_avsr_tpu.ops.augment import audio_pipeline, video_pipeline
    from omni_avsr_tpu.train.engine import OmniEngine

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    model = _flagship(tiny=False)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(lr=1e-3), 100.0, seed=0)
    batch = {k: jnp.asarray(v) for k, v in
             _batch(model, B=B, frames=frames, token_len=24).items()}
    trim = int(((whisper_token_len(frames * 640) + 24) // 25) * 25)
    rng = jax.random.PRNGKey(0)

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

    merged = engine.merged_params()
    t_aug = _time(aug, batch, rng)
    t_enc = _time(encoders, merged, batch, rng)
    t_fwd = _time(lambda s, f, b, r: fwd_jit(s, f, b, r, rate_a=4, rate_v=2,
                                             trim_len=trim)[0],
                  engine.state, engine.frozen, batch, rng)
    t_full = _time(lambda s, f, b, r: full_jit(s, f, b, r, rate_a=4, rate_v=2,
                                               trim_len=trim)[1],
                   engine.state, engine.frozen, batch, rng)

    print(json.dumps({
        "batch": B, "frames": frames,
        "full_ms": round(t_full, 1), "fwd_ms": round(t_fwd, 1),
        "encoders_ms": round(t_enc, 1), "aug_ms": round(t_aug, 1),
        "llm3_fwd_ms": round(t_fwd - t_enc, 1),
        "bwd_opt_ms": round(t_full - t_fwd, 1),
    }))


if __name__ == "__main__":
    main()
