"""Jitted decoding: greedy and beam search over the static KV cache.

Replaces HF `generate()` beam search with DynamicCache
(`modeling_OmniAVSR.py:308-323`, beams 15, max 32 new tokens) with a fully
static-shape XLA program:

  - the prefix (multimodal embeddings) is padded to a bucket length P and
    prefilled once; pad slots are masked out of the cache
  - greedy runs scan-chunks inside a while_loop (early exit at chunk
    granularity); beam runs a per-step while_loop whose sound early-exit
    bound (worst kept >= best attainable) makes stopping semantically
    identical to running all max_new steps — insertions only ever improve
    the kept set (HF's is_done cut-off, minus its early_stopping=False
    approximation)
  - beam candidate selection avoids the (B, K*V) grid: per-beam top-2K on
    raw logits (monotone under the per-beam cum - lse shift) via an exact
    chunk-max-prefiltered top-k, then the 2K*K survivors are scored with
    bit-identical elementwise ops (OMNI_BEAM_SELECT=grid: old route)
  - beam reordering is a gather on the cache's batch axis

HF semantics reproduced (transformers `BeamSearchScorer`):
  - first beam initialised to score 0, others -1e9
  - per step: top 2K of K*V candidates; EOS candidates with rank < K become
    finished hypotheses (score normalised by generated length **
    length_penalty); the K best non-EOS candidates continue
  - at the end, running beams are offered to the hypothesis heap, best
    normalised hypothesis wins.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import LLMConfig
from ..models.llm import (
    AncSplitCache,
    KVCache,
    SplitCache,
    embed_tokens,
    llm_decode_step,
    llm_decode_step_beam,
    llm_decode_step_beam_anc,
    llm_prefill,
    llm_prefill_masked,
    update_ancestors,
)

NEG = -1e9

# Beam candidate selection route: "fused" (default) selects per-beam top-2K
# on raw logits then scores survivors; "grid" materialises the full
# (B, K*V) candidate grid (the pre-round-3 route, and always used when an
# n-gram ban mask must land before selection). Motivation + A/B numbers:
# docs/ROUND3_NOTES.md "decode breakdown".
import os as _os

_SELECT_MODE = _os.environ.get("OMNI_BEAM_SELECT", "fused")


def topk_chunked(x: jax.Array, k: int, chunk: int = 128,
                 chunk_maxima: Optional[jax.Array] = None):
    """Exact top-k over the last axis via a chunk-max prefilter.

    `jax.lax.top_k` over a long row reads/sorts the whole row; this computes
    per-chunk maxima (one pass), takes the top-k CHUNKS, and finishes inside
    the k*chunk gathered survivors. Exact because at most k chunks can hold
    an element >= the k-th largest (each such chunk holds >= 1 of the k
    elements >= it), so the top-k chunks-by-max are a superset of the chunks
    containing the true top-k. Tie caveat (documented, like the fused beam
    route): >= k+1 values exactly equal at the k-th-place boundary may
    resolve in chunk-major order instead of flat-index order.

    chunk_maxima: precomputed jnp.max over the chunk axis (e.g. from the
    one-pass Pallas stats kernel, ops/select_topk.py) — must correspond to
    this exact (chunk, V) split with V % chunk == 0.

    The finish over the k*chunk survivors RECURSES with a finer chunk when
    wide: lax.top_k is ~linear in row length on TPU (measured: top-30 of
    3840 = 1.02 ms vs 240 -> 0.11 + 480 -> 0.13 at 480 rows), so a second
    prefilter level is cheaper than one wide sort.

    Returns (values, indices) shaped (..., k), sorted descending.
    """
    V = x.shape[-1]
    if chunk_maxima is None and V <= 4 * k * chunk:
        return jax.lax.top_k(x, k)  # small rows: prefilter can't pay
    C = -(-V // chunk)
    if C * chunk != V:
        assert chunk_maxima is None, "chunk_maxima requires V % chunk == 0"
        pad = jnp.full((*x.shape[:-1], C * chunk - V), NEG, x.dtype)
        x = jnp.concatenate([x, pad], axis=-1)
    xc = x.reshape(*x.shape[:-1], C, chunk)
    # NB: reduce_window looked 1.7x faster than reshape+max standalone but
    # measured SLOWER composed into the selection graph (6.3 vs 4.1 ms at
    # batch 32 — it blocks fusion); keep the fusable reshape+max.
    cm = chunk_maxima if chunk_maxima is not None else jnp.max(xc, axis=-1)
    kc = min(k, C)  # kc == C => every chunk survives: trivially exact
    _, cidx = jax.lax.top_k(cm, kc)  # (..., kc) chunk ids
    cand = jnp.take_along_axis(xc, cidx[..., None], axis=-2)  # (..., kc, chunk)
    flat = cand.reshape(*cand.shape[:-2], kc * chunk)
    if chunk > 64:  # recurse: finish inside k*16 instead of sorting k*chunk
        vals, gi = topk_chunked(flat, k, chunk=16)
    else:
        vals, gi = jax.lax.top_k(flat, k)
    idx = jnp.take_along_axis(cidx, gi // chunk, axis=-1) * chunk + gi % chunk
    return vals, idx


def _fused_select_sharded(x, k2, mesh, axis, use_kernel):
    """Vocab-sharded fused beam selection (shard_map over the tp axis).

    x: (B, K, V) raw logits whose V axis is (or can be) sharded over
    `axis`. Each shard computes its LOCAL per-beam top-k2 + row stats —
    including the one-pass Pallas stats kernel (ops/select_topk.py), which
    GSPMD alone cannot partition — then an exact cross-shard merge:
      - row max:   pmax of per-shard maxima (bit-equal)
      - normalizer: psum of se_s * exp(mx_s - mx) (summation-order ulp
        class, same as the kernel's documented lse delta)
      - top-k2:    the global top-k2 is contained in the union of per-shard
        top-k2 (any global winner is a winner of its own shard), so an
        all_gather of tp*k2 candidates + one small top_k finishes exactly.
    Returns (mx (B,K,1), lse (B,K,1), vals (B,K,k2), vidx (B,K,k2)) —
    replicated, identical to the single-device fused route modulo the
    documented fp-tie/lse-ulp classes.

    This keeps BOTH serving kernels alive under a tp mesh (VERDICT r4 §3:
    beam attention was shard_mapped in round 4; selection pinned `xla`).
    HF selection semantics: `modeling_OmniAVSR.py:312-322`.
    """
    from jax.sharding import PartitionSpec as P

    B, K, V = x.shape
    Vs = V // mesh.shape[axis]

    def shard_fn(xs):  # xs: (B, K, Vs) local vocab shard
        sid = jax.lax.axis_index(axis)
        if use_kernel:
            from ..ops.attention import on_tpu
            from ..ops.select_topk import row_stats_chunkmax

            cm, mx_s, se_s = row_stats_chunkmax(
                xs.reshape(B * K, Vs), interpret=not on_tpu())
            mx_s = mx_s.reshape(B, K)
            se_s = se_s.reshape(B, K)
            vals_s, vidx_s = topk_chunked(
                xs, k2, chunk_maxima=cm.reshape(B, K, -1))
        else:
            mx_s = jnp.max(xs, axis=-1)
            se_s = jnp.sum(jnp.exp(xs - mx_s[..., None]), axis=-1)
            vals_s, vidx_s = topk_chunked(xs, k2)
        mx = jax.lax.pmax(mx_s, axis)
        se = jax.lax.psum(se_s * jnp.exp(mx_s - mx), axis)
        gidx = (vidx_s + sid * Vs).astype(jnp.int32)
        vals_all = jax.lax.all_gather(vals_s, axis, axis=2, tiled=True)
        gidx_all = jax.lax.all_gather(gidx, axis, axis=2, tiled=True)
        vals, sel = jax.lax.top_k(vals_all, k2)
        vidx = jnp.take_along_axis(gidx_all, sel, axis=-1)
        return mx[..., None], jnp.log(se)[..., None], vals, vidx

    rep = P(None, None, None)
    return jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(None, None, axis),),
        out_specs=(rep, rep, rep, rep), check_vma=False,
    )(x)


def _prefill(params, cfg, prefix_embeds, prefix_len, key_valid, cache, modality):
    """Dispatch contiguous vs gap-tolerant prefill. Returns
    (logits, cache, n_valid)."""
    assert prefix_len is not None or key_valid is not None, (
        "decode needs prefix_len (contiguous prefix) or key_valid (gap-tolerant)"
    )
    P = prefix_embeds.shape[1]
    if key_valid is None:
        logits, cache = llm_prefill(params, cfg, prefix_embeds, prefix_len, cache, modality)
        return logits, cache, prefix_len
    n_valid = jnp.sum(key_valid, axis=1).astype(jnp.int32)
    positions = (jnp.cumsum(key_valid, axis=1) - 1).astype(jnp.int32)
    rev_arg = jnp.argmax(key_valid[:, ::-1].astype(jnp.int32), axis=1)
    last_idx = (P - 1 - rev_arg).astype(jnp.int32)
    logits, cache = llm_prefill_masked(
        params, cfg, prefix_embeds, key_valid, positions, last_idx, cache, modality
    )
    return logits, cache, n_valid


def greedy_decode(
    params,
    cfg: LLMConfig,
    prefix_embeds: jax.Array,  # (B, P, D) padded prefix
    prefix_len: Optional[jax.Array] = None,  # (B,) contiguous-prefix lengths
    *,
    max_new: int,
    eos_id: int,
    pad_id: int,
    modality: Optional[str] = None,
    key_valid: Optional[jax.Array] = None,  # (B, P) gap-tolerant validity
    cache_dtype=jnp.bfloat16,
    attn_route: Optional[str] = None,  # "kernel"/"xla"; None = platform/env
    attn_mesh=None,  # Mesh: shard_map the kernel over its tp axis
) -> jax.Array:
    """Returns (B, max_new) generated ids, pad_id after EOS.

    Early exit with chunking: steps run as `lax.scan` chunks (XLA pipelines
    scan bodies better than a per-step while_loop) inside a `while_loop`
    that stops once every sequence has emitted EOS — real transcripts
    average well under the 32-token bound, so the sequential step count
    (the latency-dominant part of RTF) tracks the actual transcript length
    at chunk granularity, while the full-length case keeps scan performance.

    Uses the beam split-cache machinery with K=1: the original
    `llm_decode_step` path re-emitted each layer's FULL (B, S, H, D) cache
    slice as a scan output to change one slot, which at serving shapes put
    the greedy step at 15% of its weight-stream roofline (10.2 ms vs 1.56
    SoL at batch 64 — benchmarks/decode_breakdown.py); the split cache
    writes one post-scan slot and keeps the read-only prefix as scan xs.
    """
    B, P, D = prefix_embeds.shape
    cache0 = KVCache.create(cfg, B, P, dtype=cache_dtype)
    logits, cache0, n_valid = _prefill(
        params, cfg, prefix_embeds, prefix_len, key_valid, cache0, modality
    )
    tokens0 = jnp.full((B, max_new), pad_id, jnp.int32)
    prefix_mask = (
        key_valid if key_valid is not None
        else jnp.arange(P)[None] < n_valid[:, None]
    )

    import os

    from ..ops.attention import on_tpu
    from ..ops.beam_attention import beam_attn_shardable, beam_attn_supported

    choice = attn_route or os.environ.get(
        "OMNI_BEAM_ATTN", "kernel" if on_tpu() else "xla")
    use_kernel = (choice == "kernel"
                  and (beam_attn_supported(cfg.head_dim) or not on_tpu())
                  and beam_attn_shardable(
                      cfg.num_heads, cfg.num_kv_heads, attn_mesh))

    if use_kernel:
        cache = AncSplitCache.from_prefill(cache0, P, 1, max_new)
        anc = jnp.zeros((B, 1, max_new), jnp.int32)  # K=1: row 0 always

        def decode_step(cache, emb, t):
            return llm_decode_step_beam_anc(
                params, cfg, emb, t, n_valid, prefix_mask, cache, anc, 1,
                modality, attn_mesh=attn_mesh)
    else:
        cache = SplitCache.from_prefill(cache0, P, 1, max_new)

        def decode_step(cache, emb, t):
            # K=1: no parents, no reorder
            return llm_decode_step_beam(
                params, cfg, emb, t, n_valid, prefix_mask, cache, 1, modality)

    CHUNK = 8 if max_new % 8 == 0 else max_new
    n_chunks = max_new // CHUNK

    def scan_step(carry, t):
        cache, logits, done, tokens = carry
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(done, pad_id, tok)
        done = done | (tok == eos_id)
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, t))
        emb = embed_tokens(params, tok[:, None], prefix_embeds.dtype)
        logits, cache = decode_step(cache, emb, t)
        return (cache, logits, done, tokens), None

    def cond(state):
        c, (_, _, done, _) = state
        return (c < n_chunks) & ~jnp.all(done)

    def body(state):
        c, carry = state
        ts = c * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)
        carry, _ = jax.lax.scan(scan_step, carry, ts)
        return (c + 1, carry)

    _, (_, _, _, tokens) = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), (cache, logits, jnp.zeros((B,), bool), tokens0)),
    )
    return tokens


def beam_search(
    params,
    cfg: LLMConfig,
    prefix_embeds: jax.Array,  # (B, P, D)
    prefix_len: Optional[jax.Array] = None,  # (B,)
    *,
    num_beams: int,
    max_new: int,
    eos_id: int,
    pad_id: int,
    modality: Optional[str] = None,
    length_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
    key_valid: Optional[jax.Array] = None,  # (B, P) gap-tolerant validity
    cache_dtype=jnp.bfloat16,
    attn_route: Optional[str] = None,  # "kernel"/"xla"; None = platform/env
    attn_mesh=None,  # Mesh: shard_map the kernel over its tp axis
) -> jax.Array:
    """Returns (B, max_new) best-hypothesis ids, pad_id after the content.

    no_repeat_ngram_size > 0 bans tokens completing an already-seen n-gram —
    the XLA-native replacement for fairseq's ngram_repeat_block CUDA kernel
    (`fairseq/clib/cuda/ngram_repeat_block_cuda.cpp`), computed as masked
    window comparisons over the on-device token buffer."""
    B, P, D = prefix_embeds.shape
    K = num_beams
    V = cfg.vocab_size
    dtype = prefix_embeds.dtype

    # prefill once per batch item; the prefix K/V stays shared across beams
    # (SplitCache) so beam reordering never re-copies it
    cache0 = KVCache.create(cfg, B, P, dtype=cache_dtype)
    logits0, cache0, n_valid = _prefill(
        params, cfg, prefix_embeds, prefix_len, key_valid, cache0, modality
    )
    prefix_len_bk = jnp.repeat(n_valid, K, axis=0)
    prefix_mask = (
        key_valid if key_valid is not None
        else jnp.arange(P)[None] < n_valid[:, None]
    )

    import os

    from ..ops.beam_attention import beam_attn_supported

    # Default on TPU since round 3: 77.9x headline vs 72.0 and 257.9 vs
    # 203.4 serving audio-s/s (docs/ROUND3_NOTES.md). Off-TPU the default
    # stays the XLA route (interpret-mode pallas is slow), but setting
    # OMNI_BEAM_ATTN=kernel forces it — the kernel self-selects interpret
    # mode there, so the route (ancestor state plumbing included) is
    # CPU-testable end-to-end at any head_dim.
    from ..ops.attention import on_tpu
    from ..ops.beam_attention import beam_attn_shardable

    choice = attn_route or os.environ.get(
        "OMNI_BEAM_ATTN", "kernel" if on_tpu() else "xla")
    use_kernel = (choice == "kernel"
                  and (beam_attn_supported(cfg.head_dim) or not on_tpu())
                  and beam_attn_shardable(
                      cfg.num_heads, cfg.num_kv_heads, attn_mesh))

    if use_kernel:
        # fused-kernel route: unpermuted gen cache + ancestor table, no
        # per-step reorder gather (ops/beam_attention.py)
        cache = AncSplitCache.from_prefill(cache0, P, K, max_new)
        anc0 = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, max_new))
        state0 = (cache, jnp.asarray(anc0))

        def step_fn(state, new_tok, flat_idx, t):
            cache, anc = state
            anc = update_ancestors(anc, flat_idx, t, K)
            emb = embed_tokens(params, new_tok.reshape(B * K, 1), dtype)
            step_logits, cache = llm_decode_step_beam_anc(
                params, cfg, emb, t, prefix_len_bk, prefix_mask, cache, anc,
                K, modality, attn_mesh=attn_mesh
            )
            return step_logits.reshape(B, K, V), (cache, anc)
    else:
        cache = SplitCache.from_prefill(cache0, P, K, max_new)
        state0 = cache

        def step_fn(cache, new_tok, flat_idx, t):
            cache = cache.reorder(flat_idx)
            emb = embed_tokens(params, new_tok.reshape(B * K, 1), dtype)
            step_logits, cache = llm_decode_step_beam(
                params, cfg, emb, t, prefix_len_bk, prefix_mask, cache, K,
                modality
            )
            return step_logits.reshape(B, K, V), cache

    return beam_loop(
        init_logits=logits0, state=state0, step_fn=step_fn,
        num_beams=K, vocab_size=V, max_new=max_new, eos_id=eos_id,
        pad_id=pad_id, length_penalty=length_penalty,
        no_repeat_ngram_size=no_repeat_ngram_size,
        # an explicitly pinned XLA attention route also pins XLA selection;
        # under a mesh the selection (incl. the Pallas stats kernel) runs
        # per vocab shard via shard_map (_fused_select_sharded)
        select_kernel=(False if attn_route == "xla" else None),
        select_mesh=attn_mesh,
    )


def beam_loop(
    *,
    init_logits: jax.Array,  # (B, V) post-prefill logits
    state,  # opaque decoder state pytree
    step_fn,  # (state, new_tok (B,K), flat_idx (B*K,), t) -> ((B,K,V) logits, state)
    num_beams: int,
    vocab_size: int,
    max_new: int,
    eos_id: int,
    pad_id: int,
    length_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
    select_kernel: Optional[bool] = None,  # None = platform/env/vocab auto
    select_mesh=None,  # Mesh: shard_map the fused selection over its tp axis
    select_axis: str = "tp",
) -> jax.Array:
    """Decoder-agnostic beam loop with HF BeamSearchScorer semantics — used
    by both the LLM (beam_search) and the AV-HuBERT seq2seq decoder."""
    B = init_logits.shape[0]
    K, V = num_beams, vocab_size
    if select_mesh is not None and (
        select_axis not in select_mesh.shape
        or select_mesh.shape[select_axis] <= 1
        or V % select_mesh.shape[select_axis] != 0
        or 2 * K > V // select_mesh.shape[select_axis]
    ):
        select_mesh = None  # nothing to shard (or V not divisible): local route
    if select_kernel is None:
        from ..ops.select_topk import select_stats_supported

        # OPT-IN (OMNI_SELECT_KERNEL=1): the one-pass stats kernel measured
        # NEUTRAL at batch 1 and SLOWER at batch 32 — the chunk-max is
        # VPU-lane-reduce-bound, not HBM-bound, so fusing the passes buys
        # nothing (docs/ROUND3_NOTES.md "selection stats kernel").
        env = _os.environ.get("OMNI_SELECT_KERNEL")
        shard_v = (V // select_mesh.shape[select_axis]
                   if select_mesh is not None else V)
        select_kernel = (
            env is not None and env not in ("0", "")
            and shard_v >= 16384 and select_stats_supported(shard_v)
        )

    logits = jnp.repeat(init_logits[:, None], K, axis=1)  # (B, K, V)
    cum = jnp.tile(jnp.array([0.0] + [NEG] * (K - 1), jnp.float32), (B, 1))  # (B, K)
    tokens = jnp.full((B, K, max_new), pad_id, jnp.int32)
    heap = (
        jnp.full((B, K), NEG, jnp.float32),
        jnp.full((B, K, max_new), pad_id, jnp.int32),
        jnp.zeros((B, K), jnp.int32),
    )
    batch_offsets = (jnp.arange(B) * K)[:, None]  # (B,1)

    def insert_hyps(heap, cand_scores, cand_tokens, cand_lens):
        """Merge candidates into the K-best heap (all (B, X, ...))."""
        h_s, h_t, h_l = heap
        s = jnp.concatenate([h_s, cand_scores], axis=1)
        tks = jnp.concatenate([h_t, cand_tokens], axis=1)
        ls = jnp.concatenate([h_l, cand_lens], axis=1)
        top = jax.lax.top_k(s, K)[1]  # (B, K) indices
        take = lambda x: jnp.take_along_axis(
            x, top.reshape(B, K, *([1] * (x.ndim - 2))), axis=1
        ) if x.ndim > 2 else jnp.take_along_axis(x, top, axis=1)
        return take(s), take(tks), take(ls)

    def ngram_ban_mask(tokens: jax.Array, t: jax.Array) -> jax.Array:
        """(B, K, V) additive mask banning n-gram-completing tokens —
        one vectorised window-compare + one scatter-add (not W full-vocab
        one-hots)."""
        n = no_repeat_ngram_size
        nm1 = n - 1
        W = max_new - nm1
        # the (n-1)-token suffix ending at position t-1
        suf_idx = jnp.clip(t - nm1 + jnp.arange(nm1), 0, max_new - 1)  # (nm1,)
        suffix = tokens[:, :, suf_idx]  # (B, K, nm1)
        # all windows at once: (B, K, W, nm1) vs suffix
        win_idx = jnp.arange(W)[:, None] + jnp.arange(nm1)[None, :]  # (W, nm1)
        windows = tokens[:, :, win_idx]  # (B, K, W, nm1)
        targets = tokens[:, :, jnp.arange(W) + nm1]  # (B, K, W)
        j = jnp.arange(W)
        hit = (
            jnp.all(windows == suffix[:, :, None, :], axis=-1)
            & ((j + nm1)[None, None] <= t - 1)
            & (t >= nm1)
        )  # (B, K, W)
        vals = jnp.where(hit, NEG, 0.0)
        ban = jnp.zeros((B, K, V), jnp.float32)
        return ban.at[
            jnp.arange(B)[:, None, None], jnp.arange(K)[None, :, None], targets
        ].add(vals)

    def step(carry, t):
        state, logits, cum, tokens, heap = carry
        if no_repeat_ngram_size > 0 or _SELECT_MODE == "grid":
            # full-grid route: the ban mask must land BEFORE selection (a
            # banned token inside a beam's top-2K would otherwise displace
            # a valid candidate), so materialise the (B, K*V) grid
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            if no_repeat_ngram_size > 0:
                logp = logp + ngram_ban_mask(tokens, t)
            cand = (cum[:, :, None] + logp).reshape(B, K * V)
            scores2k, idx2k = jax.lax.top_k(cand, 2 * K)  # (B, 2K)
        else:
            # fused route: within a beam the candidate score
            # cum_k + (x - mx_k) - lse_k is monotone in the raw logit x, so
            # the global top-2K is contained in the per-beam top-2K of raw
            # logits — select there (small rows, no (B, K*V) f32 grid, no
            # log-prob materialisation), then score only the 2K*K survivors
            # with the exact same elementwise ops as the grid route.
            # (Sole semantic edge: exact fp ties inside one beam resolve by
            # logit order here vs flat-grid index order there.)
            x = logits.astype(jnp.float32)  # (B,K,V)
            if select_mesh is not None:
                # vocab-sharded serving: per-shard selection + exact merge
                # (keeps the stats kernel usable under the mesh too)
                mx, lse, vals, vidx = _fused_select_sharded(
                    x, 2 * K, select_mesh, select_axis, select_kernel)
            elif select_kernel:
                # one-pass Pallas stats (max + normalizer + chunk maxima;
                # ops/select_topk.py) instead of 3 XLA passes; normalizer
                # summation order differs by blocking (last-ulp lse delta,
                # same measure-zero tie class the route documents)
                from ..ops.attention import on_tpu
                from ..ops.select_topk import row_stats_chunkmax

                cm, mx_r, se = row_stats_chunkmax(
                    x.reshape(B * K, V), interpret=not on_tpu())
                mx = mx_r.reshape(B, K, 1)
                lse = jnp.log(se).reshape(B, K, 1)
                vals, vidx = topk_chunked(
                    x, 2 * K, chunk_maxima=cm.reshape(B, K, -1))
            else:
                mx = jnp.max(x, axis=-1, keepdims=True)
                lse = jnp.log(jnp.sum(jnp.exp(x - mx), axis=-1, keepdims=True))
                vals, vidx = topk_chunked(x, 2 * K)  # (B, K, 2K) per beam
            cand_sel = cum[:, :, None] + ((vals - mx) - lse)  # (B, K, 2K)
            scores2k, sel = jax.lax.top_k(
                cand_sel.reshape(B, K * 2 * K), 2 * K)  # (B, 2K)
            v_sel = jnp.take_along_axis(
                vidx.reshape(B, K * 2 * K), sel, axis=1)
            idx2k = (sel // (2 * K)) * V + v_sel  # global (beam, token) ids
        parent = idx2k // V  # (B, 2K)
        tok = (idx2k % V).astype(jnp.int32)
        is_eos = tok == eos_id

        # --- finished hypotheses: EOS candidates with rank < K
        rank = jnp.broadcast_to(jnp.arange(2 * K)[None], (B, 2 * K))
        eligible = is_eos & (rank < K)
        gen_len = jnp.maximum(t, 1)  # tokens before this EOS
        norm = scores2k / (gen_len.astype(jnp.float32) ** length_penalty)
        cand_scores = jnp.where(eligible, norm, NEG)  # (B, 2K)
        parent_tokens = jnp.take_along_axis(
            tokens, parent[:, :, None], axis=1
        )  # (B, 2K, max_new)
        cand_lens = jnp.full((B, 2 * K), t, jnp.int32)
        heap = insert_hyps(heap, cand_scores, parent_tokens, cand_lens)

        # --- running beams: K best non-EOS
        run_scores = jnp.where(is_eos, NEG, scores2k)
        top_run = jax.lax.top_k(run_scores, K)[1]  # (B, K) indices into 2K
        new_cum = jnp.take_along_axis(run_scores, top_run, axis=1)
        new_parent = jnp.take_along_axis(parent, top_run, axis=1)  # (B, K)
        new_tok = jnp.take_along_axis(tok, top_run, axis=1)  # (B, K)

        # reorder token buffers + decoder state by parent beam
        tokens = jnp.take_along_axis(tokens, new_parent[:, :, None], axis=1)
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok[:, :, None], (0, 0, t)
        )
        flat_idx = (batch_offsets + new_parent).reshape(-1)  # (B*K,)
        step_logits, state = step_fn(state, new_tok, flat_idx, t)
        return (state, step_logits, new_cum, tokens, heap), None

    def cond(loop_state):
        t, _, _, cum, _, heap = loop_state
        # the early-exit bound (cum/max_new^p upper-bounds future scores
        # because cum only decreases and the normalizer grows) is only sound
        # for length_penalty >= 0; for negative penalties run the full loop
        if max_new <= 1 or length_penalty < 0:
            return t < max_new
        h_s = heap[0]
        best_attainable = jnp.max(cum, axis=1) / (jnp.float32(max_new) ** length_penalty)
        worst_kept = jnp.min(h_s, axis=1)
        done = jnp.all(worst_kept >= best_attainable)
        return (t < max_new) & ~done

    def body(loop_state):
        t, state, logits, cum, tokens, heap = loop_state
        (state, logits, cum, tokens, heap), _ = step(
            (state, logits, cum, tokens, heap), t
        )
        return (t + 1, state, logits, cum, tokens, heap)

    _, state, logits, cum, tokens, heap = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, logits, cum, tokens, heap)
    )

    # offer the running beams (full length, no EOS) to the heap
    final_norm = cum / (jnp.float32(max_new) ** length_penalty)
    heap = insert_hyps(
        heap, final_norm, tokens, jnp.full((B, K), max_new, jnp.int32)
    )
    h_s, h_t, h_l = heap
    best = jnp.argmax(h_s, axis=1)  # (B,)
    best_tokens = jnp.take_along_axis(h_t, best[:, None, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(h_l, best[:, None], axis=1)[:, 0]
    mask = jnp.arange(max_new)[None] < best_len[:, None]
    return jnp.where(mask, best_tokens, pad_id)
