"""Flash-kernel vs XLA attention sweep at LRS3-realistic shapes (real chip).

Times one fwd+bwd (grad wrt q,k,v) per config, with and without in-kernel
attention dropout, to justify the T gates in models/avhubert.py and
models/llm.py. LRS3 video runs 25 fps -> encoder T ~ 100-400; the LLM
sequence (compressed AV tokens + text) lands in 128-640.

  python benchmarks/attention_sweep.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _time(fn, *args, iters=50, repeats=3):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # warm up + sync
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        # fetch a scalar to sync (axon relay: block_until_ready does not wait)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        best.append((time.perf_counter() - t0) / iters * 1e3)  # ms
    return sorted(best)[len(best) // 2]  # median


def main():
    sys.path.insert(0, ".")
    from omni_avsr_tpu.ops.attention import dot_product_attention
    from omni_avsr_tpu.ops.flash_attention_bwd import flash_attention_trainable

    rows = []
    for (B, T, H, D) in [(8, 128, 16, 64), (8, 160, 16, 64), (8, 256, 16, 64),
                         (8, 320, 16, 64), (4, 512, 16, 64), (8, 384, 32, 128)]:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
        lens = jnp.full((B,), T, jnp.int32)

        def g(fn):
            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32))
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        from omni_avsr_tpu.ops.attention import padding_mask_from_lengths
        m = padding_mask_from_lengths(lens, T)[:, None, None, :]
        rng = jax.random.PRNGKey(3)
        xla = g(lambda q, k, v: dot_product_attention(q, k, v, mask=m))
        # the training-config alternative: XLA attention with probs dropout
        # (materialises the (B,H,T,S) mask + probs in HBM)
        xla_d = g(lambda q, k, v: dot_product_attention(
            q, k, v, mask=m, dropout_rng=rng, dropout_rate=0.1))
        fl = g(lambda q, k, v: flash_attention_trainable(q, k, v, kv_lengths=lens))
        fld = g(lambda q, k, v: flash_attention_trainable(
            q, k, v, kv_lengths=lens, dropout_rate=0.1,
            dropout_seed=jnp.int32(7)))

        t_xla = _time(xla, q, k, v)
        t_xla_d = _time(xla_d, q, k, v)
        t_fl = _time(fl, q, k, v)
        t_fld = _time(fld, q, k, v)
        rows.append(dict(B=B, T=T, H=H, D=D,
                         xla_ms=round(t_xla, 3), xla_drop_ms=round(t_xla_d, 3),
                         flash_ms=round(t_fl, 3), flash_drop_ms=round(t_fld, 3),
                         speedup=round(t_xla / t_fl, 2),
                         speedup_drop=round(t_xla_d / t_fld, 2)))
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
