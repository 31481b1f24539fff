"""Offline serving-throughput benchmark: batched AVSR decode.

Measures utterances/sec and audio-seconds/sec for batched greedy decode
through the full flagship stack, optionally with int8 decode weights:

  python benchmarks/serving_throughput.py [batch] [frames] [int8]
"""

import json
import sys
import time

import jax
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

    model = _flagship(tiny=False)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(), 1.0, noise_bank=None, seed=0)
    merged = engine.merged_params()
    if use_int8:
        from omni_avsr_tpu.ops.quant import quantize_llm_params

        merged = dict(merged)
        merged["llm"] = quantize_llm_params(merged["llm"])

    batch = {k: np.asarray(v) for k, v in _batch(model, B=B, frames=frames,
                                                 token_len=8).items()}
    trim = whisper_token_len(frames * 640)
    batch["audio_trim_len"] = int(((trim + 24) // 25) * 25)

    engine.decode_batch(merged, dict(batch), "audiovisual", 4, 2, num_beams=1)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        engine.decode_batch(merged, dict(batch), "audiovisual", 4, 2, num_beams=1)
    dt = time.perf_counter() - t0
    secs = B * frames / 25.0
    print(json.dumps({
        "metric": "serving_audio_seconds_per_s",
        "value": round(secs * n / dt, 1),
        "utterances_per_s": round(B * n / dt, 2),
        "batch": B, "frames": frames, "int8": use_int8,
    }))


if __name__ == "__main__":
    main()
