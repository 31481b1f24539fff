"""Benchmark entry point — prints ONE JSON line for the driver.

Round-1 metric: decoder training-step throughput (tokens/s) on the flagship
Llama-3.2-1B-geometry LLM with Omni-LoRA, the dominant FLOPs consumer of the
Omni-AVSR hot loop (3 LLM forwards per step, `modeling_OmniAVSR.py:263-306`).
The reference publishes no throughput numbers (SURVEY.md §6), so
vs_baseline is reported against the north-star 20x real-time decode target
once the end-to-end decode path lands; until then it is null.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from omni_avsr_tpu.config import LoRAConfig, llama32_1b
    from omni_avsr_tpu.models import llm as L

    cfg = llama32_1b(
        lora=LoRAConfig(rank_divisor=32, alpha=4, task_specific=True, v_out_divisor=4),
        vocab_size=128261,
    )
    params = L.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B, T = 4, 512
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size), jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, cfg.vocab_size)

    n_iters = 20

    # Run the whole timing loop on-device inside one jit (a fori_loop with a
    # data dependency between steps): the axon tunnel's block_until_ready
    # does not reliably wait, so a single dispatch + value fetch is the only
    # trustworthy clock.
    @jax.jit
    def timed(params, embeds, labels):
        def body(i, acc):
            e = embeds + acc * 0.0  # serialise iterations
            return acc + L.llm_loss(params, cfg, e, labels, modality="audiovisual", remat=False)

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    float(timed(params, embeds, labels))  # compile + warmup
    t0 = time.perf_counter()
    total = float(timed(params, embeds, labels))
    dt = time.perf_counter() - t0
    assert total == total, "NaN loss in bench"
    tok_per_s = B * T * n_iters / dt

    print(json.dumps({
        "metric": "llm_forward_tokens_per_s",
        "value": round(tok_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
