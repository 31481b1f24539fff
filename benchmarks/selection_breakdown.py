"""Beam-selection micro-breakdown at serving shapes (on-device chained).

The fused selection route (decode/decoding.py `beam_loop.step`) per step:
  stats      mx = max(x), lse = logsumexp shift        (2 passes over (B,K,V))
  chunkmax   per-128-chunk maxima + top-2K chunks       (1 pass + small sort)
  finish     gather 2K*128 survivors + final top-k + survivor scoring
  sel_full   all of the above composed (the real selection math)

Each probe is a fori_loop (n=400) with the logits perturbed per iteration
(axon relay: ~32/n ms additive floor, see llm_step_breakdown.py).

  python benchmarks/selection_breakdown.py [batch] [beams]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from omni_avsr_tpu.decode.decoding import topk_chunked  # noqa: E402

V = 128256


def _timed(fn, args, n=400):
    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + fn(i, acc, *a)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, K, V).astype(np.float32))
    cum = jnp.asarray(rng.randn(B, K).astype(np.float32))

    def chain(x, acc):
        return x + acc * jnp.float32(1e-38)

    def stats(i, acc, x, cum):
        x = chain(x, acc)
        mx = jnp.max(x, axis=-1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(x - mx), axis=-1, keepdims=True))
        return jnp.sum(mx) * 1e-30 + jnp.sum(lse) * 1e-30

    def chunkmax(i, acc, x, cum):
        x = chain(x, acc)
        C = V // 128
        xc = x[..., : C * 128].reshape(B, K, C, 128)
        cm = jnp.max(xc, axis=-1)
        _, cidx = jax.lax.top_k(cm, 2 * K)
        return jnp.sum(cidx).astype(jnp.float32) * 1e-30

    def finish(i, acc, x, cum):
        x = chain(x, acc)
        vals, vidx = topk_chunked(x, 2 * K)
        return jnp.sum(vals) * 1e-30 + jnp.sum(vidx).astype(jnp.float32) * 1e-30

    def sel_full(i, acc, x, cum):
        x = chain(x, acc)
        mx = jnp.max(x, axis=-1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(x - mx), axis=-1, keepdims=True))
        vals, vidx = topk_chunked(x, 2 * K)
        cand_sel = cum[:, :, None] + ((vals - mx) - lse)
        scores2k, sel = jax.lax.top_k(cand_sel.reshape(B, K * 2 * K), 2 * K)
        v_sel = jnp.take_along_axis(vidx.reshape(B, K * 2 * K), sel, axis=1)
        idx2k = (sel // (2 * K)) * V + v_sel
        return (jnp.sum(scores2k) * 1e-30
                + jnp.sum(idx2k).astype(jnp.float32) * 1e-30)

    def sel_kernel(i, acc, x, cum):
        from omni_avsr_tpu.ops.select_topk import row_stats_chunkmax

        x = chain(x, acc)
        cm, mx_r, se = row_stats_chunkmax(x.reshape(B * K, V))
        mx = mx_r.reshape(B, K, 1)
        lse = jnp.log(se).reshape(B, K, 1)
        vals, vidx = topk_chunked(x, 2 * K, chunk_maxima=cm.reshape(B, K, -1))
        cand_sel = cum[:, :, None] + ((vals - mx) - lse)
        scores2k, sel = jax.lax.top_k(cand_sel.reshape(B, K * 2 * K), 2 * K)
        v_sel = jnp.take_along_axis(vidx.reshape(B, K * 2 * K), sel, axis=1)
        idx2k = (sel // (2 * K)) * V + v_sel
        return (jnp.sum(scores2k) * 1e-30
                + jnp.sum(idx2k).astype(jnp.float32) * 1e-30)

    res = {
        "stats": _timed(stats, (logits, cum)),
        "chunkmax_topkC": _timed(chunkmax, (logits, cum)),
        "topk_chunked_full": _timed(finish, (logits, cum)),
        "sel_full": _timed(sel_full, (logits, cum)),
        "sel_kernel": _timed(sel_kernel, (logits, cum)),
    }
    bytes_one_pass = B * K * V * 4
    res["one_pass_ms_at_819GBps"] = bytes_one_pass / 819e9 * 1e3
    print(json.dumps({"batch": B, "beams": K,
                      "ms": {k: round(v, 3) for k, v in res.items()}},
                     indent=2))


if __name__ == "__main__":
    main()
