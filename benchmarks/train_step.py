"""Training-step throughput benchmark (not a driver contract; results in
README). Measures the full flagship 3-task Omni train step — on-device augs,
both encoders, 3 LLM forwards, backward over LoRA+projectors, AdamW — at a
realistic bucket shape.

  python benchmarks/train_step.py [batch_size] [frames]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import _batch, _flagship
    from omni_avsr_tpu.config import TrainConfig
    from omni_avsr_tpu.data.noise import synth_babble
    from omni_avsr_tpu.train.engine import OmniEngine
    from omni_avsr_tpu.ops.audio_frontend import whisper_token_len

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 128  # ~5.1 s clips

    model = _flagship(tiny=False)
    import dataclasses
    import os

    overrides = {}
    if os.environ.get("OMNI_WHISPER_INPUT") == "bucket":
        overrides["whisper_input_mode"] = "bucket"
    if os.environ.get("OMNI_FUSED") == "1":
        overrides["fused_task_forward"] = True
    if overrides:
        from omni_avsr_tpu.models.omni import OmniAVSR

        model = OmniAVSR(dataclasses.replace(model.cfg, **overrides), model.tok)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(lr=1e-3), 1000,
                        noise_bank=synth_babble(seconds=10.0), seed=0)
    batch = _batch(model, B=B, frames=frames, token_len=16)
    trim = int(whisper_token_len(frames * 640))
    trim = ((trim + 24) // 25) * 25

    def run_once():
        b = dict(batch)
        b["audio_trim_len"] = trim
        return engine.train_step(b)

    # warm up EVERY matryoshka rate combo deterministically (each is its
    # own XLA program; engine.train_step samples one per call). The key must
    # come from the engine so its PRNG impl (OMNI_PRNG, rbg default) matches
    # the timed path — a raw PRNGKey here would warm a different program.
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    for ra in model.cfg.audio_rates:
        for rv in model.cfg.video_rates:
            engine.state, loss = engine._train_step(
                engine.state, engine.frozen, dict(arrays), engine._next_rng(),
                rate_a=ra, rate_v=rv, trim_len=trim,
            )
    _ = float(loss)  # sync
    n = 12
    t0 = time.perf_counter()
    for _ in range(n):
        loss = run_once()
    lv = float(loss)  # sync
    dt = time.perf_counter() - t0
    clip_seconds = B * frames / 25.0
    print(json.dumps({
        "metric": "train_step_audio_seconds_per_s",
        "value": round(clip_seconds * n / dt, 2),
        "step_time_s": round(dt / n, 4),
        "batch": B, "frames": frames, "loss": round(lv, 3),
    }))


if __name__ == "__main__":
    main()
