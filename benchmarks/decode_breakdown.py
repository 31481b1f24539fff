"""Decode-path stage breakdown: encode / prefill / beam-loop / selection.

Decomposes the e2e decode RTF (bench.py) and serving throughput
(serving_throughput.py) into their sequential stages, with analytic
HBM-bytes and FLOPs per stage so each number can be compared against the
chip's roofline (v5e: 819 GB/s HBM, ~197 bf16 TFLOP/s):

  python benchmarks/decode_breakdown.py [batch] [frames] [beams] [bf16]

Stages (each timed as its own on-device chained loop, one sync per probe —
the axon relay rules from utils/profiling.py apply):
  encode        preprocess + infer_prefix_masked (all encoder towers +
                projectors + prefix assembly)
  prefill       encode + masked prefill          (delta = prefill cost)
  selection     beam_loop bookkeeping only: log-softmax + 2x top-k + heap
                insert + token reorder over (B, K*V) f32, no LLM step, no
                cache reorder (synthetic logits threaded through the carry)
  full          the complete decode (bench.py / serving configuration)

Derived: llm_steps = full - prefill(delta-inclusive) - selection. The
remainder per step is the weight-streaming + KV-attention cost of
`llm_decode_step_beam`, to be read against the analytic int8 weight bytes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0  # v5e
PEAK_TFLOPS = 197.0  # bf16


def _timed_loop(fn, args, n=10):
    """Compile, then time n chained on-device iterations; one sync."""

    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + fn(i, acc, *a)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(*args))  # compile + sync (fetch value: axon relay rule)
    t0 = time.perf_counter()
    float(run(*args))
    dt = time.perf_counter() - t0
    return dt / n * 1e3  # ms per iteration


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import _batch, _flagship
    from omni_avsr_tpu.config import TrainConfig
    from omni_avsr_tpu.decode.decoding import _prefill, beam_loop
    from omni_avsr_tpu.models.llm import KVCache
    from omni_avsr_tpu.ops.audio_frontend import whisper_token_len
    from omni_avsr_tpu.train.engine import OmniEngine, _round_up
    from omni_avsr_tpu.utils.profiling import chain_iteration

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    beams = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    use_int8 = "bf16" not in sys.argv[4:]

    model = _flagship(tiny=os.environ.get("OMNI_BREAKDOWN_TINY") == "1")
    if os.environ.get("BENCH_WHISPER", "bucket") == "bucket":
        import dataclasses

        from omni_avsr_tpu.models.omni import OmniAVSR

        model = OmniAVSR(
            dataclasses.replace(model.cfg, whisper_input_mode="bucket"),
            model.tok)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(), 1.0, noise_bank=None,
                        seed=0)
    merged = engine.merged_params()
    if use_int8:
        from omni_avsr_tpu.ops.quant import quantize_decode_params

        merged = quantize_decode_params(merged)

    batch = {k: jnp.asarray(v) for k, v in
             _batch(model, B=B, frames=frames, token_len=8).items()}
    trim = whisper_token_len(frames * 640)
    trim = int(((trim + 24) // 25) * 25)
    arrays = {k: v for k, v in batch.items()
              if k not in ("gold_text", "audio_trim_len")}
    rng = jax.random.PRNGKey(0)
    cfg = model.cfg
    max_new = cfg.max_dec_tokens
    V = cfg.llm.vocab_size
    K = beams

    # --- analytic per-step bytes: every frozen LLM weight leaf streamed per
    # decode step (embed excluded: row gather).  int8 leaves count 1 B/param.
    def _bytes(tree, skip=("embed",)):
        total = 0
        for k, v in tree.items():
            if k in skip:
                continue
            if hasattr(v, "dtype"):
                total += v.size * v.dtype.itemsize
            elif isinstance(v, dict):
                total += _bytes(v, ())
        return total

    step_weight_gb = _bytes(merged["llm"]) / 1e9
    sel_gb = B * K * V * 4 / 1e9  # one f32 pass over the candidate grid

    results = {}

    # -------------------------------------------------------------- encode
    def encode_probe(i, acc, params, arrays):
        proc = engine._preprocess(chain_iteration(arrays, acc), rng,
                                  train=False)
        prefix, key_valid = model.infer_prefix_masked(
            params, proc, "audiovisual", 4, 2, trim)
        return jnp.sum(prefix).astype(jnp.float32) * 1e-30

    results["encode"] = _timed_loop(encode_probe, (merged, arrays))
    print("encode done", results["encode"], file=sys.stderr, flush=True)

    # ------------------------------------------------------------- prefill
    def prefill_probe(i, acc, params, arrays):
        proc = engine._preprocess(chain_iteration(arrays, acc), rng,
                                  train=False)
        prefix, key_valid = model.infer_prefix_masked(
            params, proc, "audiovisual", 4, 2, trim)
        Bp, P0, D = prefix.shape
        P = _round_up(P0, 16)
        prefix = jnp.pad(prefix, ((0, 0), (0, P - P0), (0, 0)))
        key_valid = jnp.pad(key_valid, ((0, 0), (0, P - P0)))
        cache = KVCache.create(cfg.llm, Bp, P, dtype=jnp.bfloat16)
        logits, cache, n_valid = _prefill(
            params["llm"], cfg.llm, prefix, None, key_valid, cache,
            "audiovisual" if cfg.llm.lora and cfg.llm.lora.task_specific
            else None)
        return jnp.sum(logits).astype(jnp.float32) * 1e-30

    results["encode_prefill"] = _timed_loop(prefill_probe, (merged, arrays))
    print("prefill done", results["encode_prefill"], file=sys.stderr, flush=True)

    # ----------------------------------------------------------- selection
    # beam bookkeeping only: synthetic per-step logits threaded through the
    # loop carry; no LLM step, no cache reorder.
    base_logits = jax.random.normal(jax.random.PRNGKey(1), (B, V),
                                    jnp.float32)
    # suppress EOS so the probe never early-exits: always max_new steps
    base_logits = base_logits.at[:, model.tok.eos_id].set(-1e9)

    def selection_probe(i, acc, base):
        init = base + acc * 1e-38

        def step_fn(state, new_tok, flat_idx, t):
            state = state + jnp.float32(1e-6) * jnp.sum(new_tok)
            logits = jnp.broadcast_to(state[:, None, :], (B, K, V))
            return logits, state

        ids = beam_loop(
            init_logits=init, state=init, step_fn=step_fn, num_beams=K,
            vocab_size=V, max_new=max_new, eos_id=model.tok.eos_id,
            pad_id=model.tok.pad_id)
        return jnp.sum(ids).astype(jnp.float32) * 1e-30

    results["selection"] = _timed_loop(selection_probe, (base_logits,))
    print("selection done", results["selection"], file=sys.stderr, flush=True)

    # ---------------------------------------------------------------- full
    decode_fn = engine._decode_fn("audiovisual", 4, 2, trim, beams, max_new)

    def full_probe(i, acc, params, arrays):
        ids = decode_fn(params, chain_iteration(arrays, acc), rng)
        return jnp.sum(ids).astype(jnp.float32) * 1e-30

    results["full"] = _timed_loop(full_probe, (merged, arrays))

    prefill_ms = results["encode_prefill"] - results["encode"]
    loop_ms = results["full"] - results["encode_prefill"]
    llm_steps_ms = loop_ms - results["selection"]
    per_step = llm_steps_ms / max_new
    sol_step_ms = step_weight_gb / HBM_GBPS * 1e3
    sol_sel_ms = sel_gb / HBM_GBPS * 1e3  # per step, one pass lower bound

    print(json.dumps({
        "batch": B, "frames": frames, "beams": K, "int8": use_int8,
        "whisper": os.environ.get("BENCH_WHISPER", "bucket"),
        "ms": {k: round(v, 2) for k, v in results.items()},
        "derived_ms": {
            "prefill": round(prefill_ms, 2),
            "beam_loop": round(loop_ms, 2),
            "selection": round(results["selection"], 2),
            "llm_steps": round(llm_steps_ms, 2),
            "llm_per_step": round(per_step, 3),
        },
        "roofline": {
            "llm_weight_gb_per_step": round(step_weight_gb, 3),
            "sol_llm_step_ms": round(sol_step_ms, 3),
            "sel_grid_gb_per_step": round(sel_gb, 4),
            "sol_selection_ms_per_step_1pass": round(sol_sel_ms, 4),
            "llm_step_sol_pct": round(100 * sol_step_ms / max(per_step, 1e-9), 1),
        },
    }))


if __name__ == "__main__":
    main()
