"""Cold-start compile budget for the static-shape program matrix
(VERDICT r4 item 7).

The engine caches one XLA program per (bucket, rate_a, rate_v) train step
and per (task, rate_a, rate_v, bucket) decode; the reference pays none of
this (eager torch, `train_OmniAVSR.py`). This audits what a cold start of
the full recipe costs at FLAGSHIP geometry (Llama-3.2-1B + Whisper-medium
+ AV-HuBERT-Large) on one chip:

  - measures trace+lower and backend-compile seconds per REPRESENTATIVE
    program (one train step per rate pair or one total, one beam-15 decode
    per task — shapes, not rates, dominate compile time),
  - extrapolates the full matrix (rates x buckets x tasks) from them,
  - prints the table + ONE JSON summary line.

AOT (`jit(...).lower(ShapeDtypeStruct...).compile()`): no parameters are
materialized and nothing executes — pure compile cost.

Mitigation shipped alongside: `--compilation-cache-dir` on every CLI (or
$OMNI_COMPILE_CACHE; `utils/compile_cache.py`) turns the whole matrix into
a once-per-machine cost — re-run this script with --cache-dir twice to see
the deserialization-vs-compile delta.

  python benchmarks/compile_budget.py                  # flagship, on-chip
  python benchmarks/compile_budget.py --measure all    # every rate pair
  python benchmarks/compile_budget.py --tiny           # CPU wiring smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _abstract(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def time_compile(fn, *abstract_args):
    """Returns (lower_s, compile_s, flops) for jit(fn) at the given
    abstract arguments — no execution, no buffers."""
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*abstract_args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    flops = float((compiled.cost_analysis() or {}).get("flops", 0.0))
    del compiled, lowered
    return t1 - t0, t2 - t1, flops


def main(argv=None):
    p = argparse.ArgumentParser("compile_budget")
    p.add_argument("--tiny", action="store_true", help="tiny dims, CPU smoke")
    p.add_argument("--measure", default="representative",
                   choices=["representative", "all"],
                   help="representative = 1 train program + 1 decode/task; "
                        "all = every rate pair")
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--beams", type=int, default=15)
    p.add_argument("--decode-batch", type=int, default=2)
    p.add_argument("--train-buckets", type=int, default=4,
                   help="bucket-ladder size for the extrapolated total "
                        "(recipes bucket lengths into a handful of shapes)")
    p.add_argument("--decode-buckets", type=int, default=3)
    p.add_argument("--cache-dir", default=None,
                   help="enable the persistent compile cache for this run")
    args = p.parse_args(argv)

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    if args.cache_dir:
        from omni_avsr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(args.cache_dir)

    import __graft_entry__ as g
    from omni_avsr_tpu.config import TrainConfig
    from omni_avsr_tpu.decode.decoding import beam_search
    from omni_avsr_tpu.ops.audio_frontend import whisper_token_len
    from omni_avsr_tpu.ops.augment import audio_pipeline, video_pipeline
    from omni_avsr_tpu.train.optim import make_optimizer
    from omni_avsr_tpu.train.state import create_train_state, make_train_step, split_params

    model = g._flagship(tiny=args.tiny)
    cfg = model.cfg
    tok = model.tok
    B, frames = (2, 16) if args.tiny else (args.batch, args.frames)
    trim = whisper_token_len(frames * 640)
    rate_pairs = [(ra, rv) for ra in cfg.audio_rates for rv in cfg.video_rates]

    # ---- abstract train state -------------------------------------------
    tx, _ = make_optimizer(TrainConfig(lr=1e-3), steps_per_epoch=1000)
    pred = model.trainable_predicate(("peft_llm", "lora_avhubert"))
    p_abs = jax.eval_shape(lambda k: model.init_params(k), jax.random.PRNGKey(0))
    trainable_abs, frozen_abs = split_params(p_abs, pred)
    state_abs = jax.eval_shape(lambda t: create_train_state(t, tx), trainable_abs)
    batch_abs = _abstract(g._batch(model, B=B, frames=frames, token_len=32))
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def train_fn(ra, rv):
        def loss_fn(params, batch, rng, *_):
            k_aug, k_drop = jax.random.split(rng)
            proc = dict(batch)
            kv, ka = jax.random.split(k_aug)
            proc["video"] = video_pipeline(kv, batch["video"], batch["video_len"], train=True)
            proc["audio"] = audio_pipeline(ka, batch["audio"], batch["audio_len"], train=True)
            losses = model.train_losses(params, proc, ra, rv, trim,
                                        train_mode=True, dropout_rng=k_drop)
            return (losses["audio"] + losses["video"] + losses["audiovisual"]) / 3.0

        step = make_train_step(loss_fn, tx)
        return lambda st, fz, b, r: step(st, fz, b, r)

    rows = []
    measure_pairs = rate_pairs if args.measure == "all" else rate_pairs[:1]
    for ra, rv in measure_pairs:
        lo, co, fl = time_compile(train_fn(ra, rv), state_abs, frozen_abs,
                                  batch_abs, rng_abs)
        rows.append(dict(program=f"train a={ra} v={rv} B={B} F={frames}",
                         lower_s=lo, compile_s=co, gflops=fl / 1e9,
                         measured=True, kind="train"))

    # ---- decode programs (one per task; prefix shape is the variable) ----
    merged_abs = jax.eval_shape(
        lambda k: model.init_params(k, frozen_dtype=jnp.bfloat16,
                                    train_dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    dframes = 16 if args.tiny else 96
    dtrim = whisper_token_len(dframes * 640)
    dbatch = g._batch(model, B=args.decode_batch, frames=dframes, token_len=4)
    for k in ("tokens", "labels"):
        dbatch.pop(k, None)
    dbatch_abs = _abstract(dbatch)
    task_rates = {"audio": (4, None), "video": (None, 2),
                  "audiovisual": (4, 2)}

    def decode_fn(task, ra, rv):
        def fn(params, batch, rng):
            kv, ka = jax.random.split(rng)
            proc = dict(batch)
            if "video" in batch:
                proc["video"] = video_pipeline(kv, batch["video"], batch["video_len"], train=False)
            if "audio" in batch:
                proc["audio"] = audio_pipeline(ka, batch["audio"], batch["audio_len"], train=False)
            prefix, key_valid = model.infer_prefix_masked(params, proc, task, ra, rv, dtrim)
            pad = (-prefix.shape[1]) % 16
            prefix = jnp.pad(prefix, ((0, 0), (0, pad), (0, 0)))
            key_valid = jnp.pad(key_valid, ((0, 0), (0, pad)))
            return beam_search(params["llm"], cfg.llm, prefix,
                               num_beams=args.beams, max_new=32,
                               eos_id=tok.eos_id, pad_id=tok.pad_id,
                               modality=task, key_valid=key_valid)
        return fn

    for task, (ra, rv) in task_rates.items():
        lo, co, fl = time_compile(decode_fn(task, ra, rv), merged_abs,
                                  dbatch_abs, rng_abs)
        rows.append(dict(program=f"decode {task} beam={args.beams} B={args.decode_batch}",
                         lower_s=lo, compile_s=co, gflops=fl / 1e9,
                         measured=True, kind="decode"))

    # ---- extrapolated full-recipe matrix ---------------------------------
    t_train = [r for r in rows if r["kind"] == "train"]
    t_dec = [r for r in rows if r["kind"] == "decode"]
    per_train = sum(r["lower_s"] + r["compile_s"] for r in t_train) / len(t_train)
    per_dec = sum(r["lower_s"] + r["compile_s"] for r in t_dec) / len(t_dec)
    n_train = len(rate_pairs) * args.train_buckets
    # decode grid: audio rates + video rates + av pairs, per decode bucket
    n_dec_settings = (len(cfg.audio_rates) + len(cfg.video_rates)
                      + len(rate_pairs)) * args.decode_buckets
    total = per_train * n_train + per_dec * n_dec_settings

    print(f"\n{'program':<44} {'lower_s':>8} {'compile_s':>10} {'GFLOP':>10}")
    for r in rows:
        print(f"{r['program']:<44} {r['lower_s']:>8.1f} {r['compile_s']:>10.1f} "
              f"{r['gflops']:>10.1f}")
    print(f"\nextrapolated cold-start totals "
          f"({args.train_buckets} train buckets, {args.decode_buckets} decode buckets):")
    print(f"  train matrix : {n_train:3d} programs x {per_train:6.1f}s = "
          f"{per_train * n_train / 60:6.1f} min")
    print(f"  decode matrix: {n_dec_settings:3d} programs x {per_dec:6.1f}s = "
          f"{per_dec * n_dec_settings / 60:6.1f} min")
    print(f"  TOTAL        : {total / 60:.1f} min "
          f"(mitigation: --compilation-cache-dir => once per machine)")
    print(json.dumps({
        "per_train_s": round(per_train, 1), "per_decode_s": round(per_dec, 1),
        "n_train_programs": n_train, "n_decode_programs": n_dec_settings,
        "cold_start_total_min": round(total / 60, 1),
        "measured_rows": len(rows), "cache_dir": args.cache_dir,
    }))
    return rows


if __name__ == "__main__":
    main()
