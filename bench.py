"""Benchmark entry point — prints ONE JSON line for the driver.

Headline metric: end-to-end AVSR decode real-time factor (RTF) on one chip —
raw 96x96 video frames + 16 kHz waveform in, transcript ids out, through the
full flagship stack (on-device log-mel + Whisper-medium geometry encoder,
ResNet3D + AV-HuBERT-Large geometry video encoder, matryoshka compression at
(audio 4, video 2), projectors, Llama-3.2-1B decoder with Omni-LoRA) in the
REFERENCE DECODE CONFIGURATION: beam 15, 32 new tokens
(`modeling_OmniAVSR.py:312-322`) with a static split KV cache.

Defaults (round 3) run the validated fast paths — each is WER-neutral by
tiny-trained-model evidence and stays one env var away from reference-exact
for converted-checkpoint verification (PARITY.md "bench defaults"):
  - bucketed Whisper window  (tests/test_bucket_wer.py;   BENCH_WHISPER=pad30s)
  - int8 weight-only decode  (tests/test_int8_wer.py;     BENCH_INT8=0)
  - beam 15                  (the reference's own setting; BENCH_BEAMS=1 for
    the greedy number reported in rounds 1-2)

vs_baseline is RTF / 20 — the north-star target is >= 20x real time per
TPU v5e chip (BASELINE.md). Weights are random (no checkpoint access here);
FLOPs and memory traffic are identical to converted weights.

NOTE: under the axon tunnel block_until_ready() does not reliably wait —
timing fetches real values instead (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _batch, _flagship
    from omni_avsr_tpu.config import TrainConfig
    from omni_avsr_tpu.train.engine import OmniEngine

    import os

    model = _flagship(tiny=False)
    # bucketed Whisper window is the default (kept mel frames bit-identical,
    # WER-neutral per tests/test_bucket_wer.py); BENCH_WHISPER=pad30s gives
    # the reference-exact 30 s window.
    if os.environ.get("BENCH_WHISPER", "bucket") == "bucket":
        import dataclasses

        from omni_avsr_tpu.models.omni import OmniAVSR

        model = OmniAVSR(
            dataclasses.replace(model.cfg, whisper_input_mode="bucket"),
            model.tok)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(), 1.0, noise_bank=None, seed=0)
    merged = engine.merged_params()
    # int8 weight-only decode is the default (WER-neutral per
    # tests/test_int8_wer.py); BENCH_INT8=0 for bf16 weights.
    # BENCH_QUANT=int4 opts into the packed-int4 LLM runtime (uint8 nibble
    # container, ops/quant.py::pack_llm_int4; int4-RTN numerics gated by
    # benchmarks/wer_probe.py — needs real-ckpt WER before promotion).
    quant_mode = os.environ.get("BENCH_QUANT", "")
    if not quant_mode:
        quant_mode = ("int8" if os.environ.get("BENCH_INT8", "1")
                      not in ("0", "") else "")
    if quant_mode:
        from omni_avsr_tpu.ops.quant import quantize_for_decode

        merged = quantize_for_decode(merged, quant_mode)

    # default = the WER-parity decode configuration
    # (`modeling_OmniAVSR.py:312-322`: beams 15, 32 new tokens);
    # BENCH_BEAMS=1 gives the greedy metric reported in rounds 1-2.
    beams = int(os.environ.get("BENCH_BEAMS", "15"))

    frames = 160  # 6.4 s clip @ 25 fps
    secs = frames / 25.0
    batch = _batch(model, B=1, frames=frames, token_len=8)
    # pre-place the batch on device once: a serving host overlaps uploads
    # with compute, and this dev environment reaches the chip through a
    # socket relay whose per-call transfer would otherwise dominate
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    dev_batch["audio_trim_len"] = 325  # whisper_token_len(6.4 s) -> 320, bucket 325

    decode_fn = engine._decode_fn("audiovisual", 4, 2, 325, beams,
                                  model.cfg.max_dec_tokens)
    arrays = {k: v for k, v in dev_batch.items()
              if k not in ("gold_text", "audio_trim_len")}
    rng = jax.random.PRNGKey(0)

    # run the timing loop ON DEVICE (one dispatch, chained iterations):
    # the dev relay costs ~28 ms per host dispatch, which would otherwise
    # pollute the measurement (see .claude/skills/verify/SKILL.md)
    from omni_avsr_tpu.utils.profiling import chain_iteration

    # one on-device loop, ONE host dispatch+fetch: the axon relay round-trip
    # (~32 ms quiet, worse under host load) is amortised across n_iters —
    # at 10 iters it was a 4%+ headline haircut whenever anything else ran
    # on the host
    n_iters = 40

    @jax.jit
    def timed(params, arrays):
        def body(i, acc):
            ids = decode_fn(params, chain_iteration(arrays, acc), rng)
            return acc + jnp.sum(ids)

        return jax.lax.fori_loop(0, n_iters, body, jnp.int32(0))

    int(timed(merged, arrays))  # compile
    t0 = time.perf_counter()
    total = int(timed(merged, arrays))
    dt = time.perf_counter() - t0
    rtf = secs * n_iters / dt

    print(json.dumps({
        "metric": "avsr_e2e_decode_rtf" + (f"_beam{beams}" if beams > 1 else ""),
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
