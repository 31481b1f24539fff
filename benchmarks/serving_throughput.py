"""Offline serving-throughput benchmark: batched AVSR decode.

Measures utterances/sec and audio-seconds/sec for batched greedy decode
through the full flagship stack, optionally with int8 decode weights:

  python benchmarks/serving_throughput.py [batch] [frames] [int8]

The timing loop runs ON DEVICE in one dispatch (chained iterations with a
data dependency) — this dev environment reaches its chip through a socket
relay whose per-call dispatch (~28 ms) and batch upload (~35 MB at batch 8)
otherwise dominate; a serving host overlaps uploads with compute.
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
    from omni_avsr_tpu.ops.audio_frontend import whisper_token_len
    from omni_avsr_tpu.train.engine import OmniEngine

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 160  # 6.4 s
    use_int8 = len(sys.argv) > 3 and sys.argv[3] == "int8"
    import os

    # BEAMS=15 measures the WER-parity decode config (beam 15, 32 tokens)
    beams = int(os.environ.get("BEAMS", "1"))

    model = _flagship(tiny=False)
    if os.environ.get("OMNI_WHISPER_INPUT") == "bucket":
        import dataclasses

        from omni_avsr_tpu.models.omni import OmniAVSR

        model = OmniAVSR(dataclasses.replace(model.cfg,
                                             whisper_input_mode="bucket"),
                         model.tok)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(), 1.0, noise_bank=None, seed=0)
    merged = engine.merged_params()
    if use_int8:
        from omni_avsr_tpu.ops.quant import quantize_llm_params

        merged = dict(merged)
        merged["llm"] = quantize_llm_params(merged["llm"])

    batch = {k: jnp.asarray(v) for k, v in _batch(model, B=B, frames=frames,
                                                  token_len=8).items()}
    trim = whisper_token_len(frames * 640)
    trim_bucket = int(((trim + 24) // 25) * 25)
    batch["audio_trim_len"] = trim_bucket

    from omni_avsr_tpu.utils.profiling import chain_iteration

    decode_fn = engine._decode_fn("audiovisual", 4, 2, trim_bucket, beams,
                                  model.cfg.max_dec_tokens)
    arrays = {k: v for k, v in batch.items()
              if k not in ("gold_text", "audio_trim_len")}
    rng = jax.random.PRNGKey(0)
    n = 10

    @jax.jit
    def timed(params, arrays):
        def body(i, acc):
            ids = decode_fn(params, chain_iteration(arrays, acc), rng)
            return acc + jnp.sum(ids)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    int(timed(merged, arrays))  # compile + sync (axon: fetch, don't block)
    t0 = time.perf_counter()
    int(timed(merged, arrays))
    dt = time.perf_counter() - t0
    secs = B * frames / 25.0
    print(json.dumps({
        "metric": "serving_audio_seconds_per_s" + (f"_beam{beams}" if beams > 1 else ""),
        "value": round(secs * n / dt, 1),
        "utterances_per_s": round(B * n / dt, 2),
        "batch": B, "frames": frames, "int8": use_int8, "beams": beams,
        "whisper": os.environ.get("OMNI_WHISPER_INPUT", "pad30s"),
    }))


if __name__ == "__main__":
    main()
