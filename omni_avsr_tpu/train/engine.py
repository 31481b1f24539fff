"""OmniEngine: jit-cached train/eval/decode execution around OmniAVSR.

The engine owns:
  - the trainable/frozen split + optimizer state (bf16-true semantics)
  - jitted step functions cached by (batch shapes, static rates, task) —
    the TPU answer to the reference's per-step `random.choice` of a
    matryoshka rate (`modeling_OmniAVSR.py:474,549`): the host samples the
    rate, XLA reuses one of |rates_a| x |rates_v| compiled programs
  - on-device augmentation (ops/augment.py) fused into the loss program
  - greedy/beam decoding with bucketed prefix shapes.

Loss scaling note: the reference rescales DDP rank losses by gathered batch
sizes (`lightning_OmniAVSR.py:171-173`) because torch DDP averages ranks
equally. Under GSPMD the batch is one global array and the CE mean already
weights every token equally across the mesh — no correction needed.
"""

from __future__ import annotations

import functools
import os
import random
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OmniConfig, TrainConfig
from ..decode.decoding import beam_search, greedy_decode
from ..models.omni import OmniAVSR
from ..ops.augment import audio_pipeline, video_pipeline
from .optim import make_optimizer
from .state import TrainState, create_train_state, make_train_step, merge_params, split_params


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class OmniEngine:
    def __init__(
        self,
        model: OmniAVSR,
        params: Dict[str, Any],
        train_cfg: TrainConfig,
        steps_per_epoch: float = 1000.0,
        unfrozen_modules: Tuple[str, ...] = ("peft_llm", "lora_avhubert"),
        noise_bank: Optional[np.ndarray] = None,
        decode_snr_target: Optional[float] = None,
        seed: int = 42,
        inference_only: bool = False,
        augment: bool = True,
        pipeline=None,  # parallel.pipeline.PipelinePlan — GPipe the decoder
    ):
        self.model = model
        self.cfg = model.cfg
        self.train_cfg = train_cfg
        self.tok = model.tok
        self.noise_bank = jnp.asarray(noise_bank) if noise_bank is not None else None
        self.decode_snr_target = decode_snr_target
        # augment=False trains on eval-mode features (center crop, no time
        # masks/noise) — used by the WER-neutrality probe, which needs TRUE
        # memorization so quantization noise is the only disturbance
        self.augment = augment
        # PipelinePlan: train/eval decoder forwards run the GPipe schedule
        # over the plan's pp mesh axis (`parallel/pipeline.py`) inside the
        # same jitted step — loss/grads/AdamW all flow through it. Decode
        # keeps the KV-cache path (PP is a training-throughput axis).
        self.pipeline = pipeline
        self._py_rng = random.Random(seed)
        # Dropout/augment bit generation: the default threefry2x32 runs as
        # plain VPU arithmetic (~5 ms/step of mask bits at B12, ledger r3);
        # `rbg` maps to XLA's RngBitGenerator -> the TPU hardware PRNG.
        # Distribution-equivalent for masks (NOT bit-reproducible across
        # impls); OMNI_PRNG=threefry restores the old stream.
        impl = os.environ.get("OMNI_PRNG", "rbg")
        self._rng_key = (
            jax.random.PRNGKey(seed) if impl == "threefry"
            else jax.random.key(seed, impl=impl)
        )

        pred = model.trainable_predicate(unfrozen_modules)
        trainable, frozen = split_params(params, pred)
        self.frozen = frozen
        if inference_only:
            # no optimizer state (it would hold f32 masters + Adam moments
            # of every adapter for nothing on a serving host)
            self.tx = self.schedule = None
            self.state = TrainState(
                step=jnp.zeros((), jnp.int32),
                trainable=jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), trainable
                ),
                opt_state=None,
            )
            self._train_step = self._eval_step = None
        else:
            self.tx, self.schedule = make_optimizer(train_cfg, steps_per_epoch)
            self.state = create_train_state(trainable, self.tx)

            self._train_step = jax.jit(
                self._make_step(is_train=True),
                static_argnames=("rate_a", "rate_v", "trim_len"),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(
                self._make_step(is_train=False),
                static_argnames=("rate_a", "rate_v", "trim_len"),
            )
        self._decode_fns: Dict = {}
        # None = route by platform/env (decode/decoding.py); "xla" pins the
        # partitionable attention for mesh-sharded serving (serve.py)
        self.decode_attn_route: Optional[str] = None
        # Mesh for shard_map-ing the beam-attention kernel per tp shard —
        # set by serve.py so mesh-sharded serving KEEPS the kernel route
        self.decode_attn_mesh = None
        # baseline (Llama-AVSR / Llama-MTSK) single-task steps, jitted lazily
        self._single_train = jax.jit(
            self._make_single_step(is_train=True),
            static_argnames=("modality", "trim_len"),
            donate_argnums=(0,),
        )
        self._single_eval = jax.jit(
            self._make_single_step(is_train=False),
            static_argnames=("modality", "trim_len"),
        )

    # ------------------------------------------------------------------ steps

    def _preprocess(self, batch: Dict[str, jax.Array], rng: jax.Array, train: bool) -> Dict[str, jax.Array]:
        out = dict(batch)
        kv, ka = jax.random.split(rng)
        train = train and self.augment
        if "video" in batch:
            out["video"] = video_pipeline(
                kv, batch["video"], batch["video_len"], train=train
            )
        if "audio" in batch:
            out["audio"] = audio_pipeline(
                ka, batch["audio"], batch["audio_len"], train=train,
                noise_bank=self.noise_bank,
                snr_target=None if train else self.decode_snr_target,
            )
        return out

    def _make_step(self, is_train: bool):
        model = self.model
        weights = self.cfg.matry_weights

        def loss_fn(params, batch, rng, rate_a, rate_v, trim_len):
            k_aug, k_drop = jax.random.split(rng)
            proc = self._preprocess(batch, k_aug, train=is_train)
            # augment=False trains on the decode-time computation end to
            # end: eval-mode BN (running stats) and no dropout, so the
            # memorization probe's train/decode graphs are identical
            mode = is_train and self.augment
            losses = model.train_losses(
                params, proc, rate_a, rate_v, trim_len, train_mode=mode,
                dropout_rng=k_drop if mode else None,
                pipeline=self.pipeline,
            )
            total = (losses["audio"] + losses["video"] + losses["audiovisual"]) / 3.0
            return total, losses

        if is_train:
            base = make_train_step(
                lambda p, b, r, ra, rv, tl: loss_fn(p, b, r, ra, rv, tl)[0],
                self.tx,
            )

            def step(state, frozen, batch, rng, *, rate_a, rate_v, trim_len):
                return base(state, frozen, batch, rng, rate_a, rate_v, trim_len)

            return step

        def eval_step(state, frozen, batch, rng, *, rate_a, rate_v, trim_len):
            t_cast = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), state.trainable)
            params = merge_params(t_cast, frozen)
            return loss_fn(params, batch, rng, rate_a, rate_v, trim_len)

        return eval_step

    def _rate_combos(self, modality: str):
        """Rate grid for the baseline MTSK loss: all rates (single modality)
        or the full video x audio cross product (AVSR), averaged —
        `modeling_LlamaAVSR.py:244-251, 317-332`."""
        cfg = self.cfg
        if not cfg.is_matryoshka:
            return [(cfg.audio_rates[0], cfg.video_rates[0])]
        if modality == "audio":
            return [(ra, None) for ra in cfg.audio_rates]
        if modality == "video":
            return [(None, rv) for rv in cfg.video_rates]
        return [(ra, rv) for rv in cfg.video_rates for ra in cfg.audio_rates]

    def _make_single_step(self, is_train: bool):
        model = self.model

        def loss_fn(params, batch, rng, modality, trim_len):
            proc = self._preprocess(batch, rng, train=is_train)
            combos = self._rate_combos(modality)
            total = 0.0
            for ra, rv in combos:
                total = total + model.single_task_loss(
                    params, proc, modality, ra, rv, trim_len,
                    train_mode=is_train, pipeline=self.pipeline,
                )
            return total / len(combos)

        if is_train:
            base = make_train_step(loss_fn, self.tx)

            def step(state, frozen, batch, rng, *, modality, trim_len):
                return base(state, frozen, batch, rng, modality, trim_len)

            return step

        def eval_step(state, frozen, batch, rng, *, modality, trim_len):
            t_cast = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), state.trainable)
            params = merge_params(t_cast, frozen)
            return loss_fn(params, batch, rng, modality, trim_len)

        return eval_step

    def single_train_step(self, batch: Dict[str, np.ndarray], modality: str) -> jax.Array:
        trim = int(batch.pop("audio_trim_len", 1500)) if "audio_trim_len" in batch else 1500
        arrays = {
            k: (v if isinstance(v, jax.Array) else jnp.asarray(v))
            for k, v in batch.items() if not isinstance(v, (int, list))
        }
        self.state, loss = self._single_train(
            self.state, self.frozen, arrays, self._next_rng(),
            modality=modality, trim_len=trim,
        )
        return loss

    def single_eval_step(self, batch: Dict[str, np.ndarray], modality: str) -> jax.Array:
        trim = int(batch.pop("audio_trim_len", 1500)) if "audio_trim_len" in batch else 1500
        arrays = {
            k: (v if isinstance(v, jax.Array) else jnp.asarray(v))
            for k, v in batch.items() if not isinstance(v, (int, list))
        }
        return self._single_eval(
            self.state, self.frozen, arrays, self._next_rng(),
            modality=modality, trim_len=trim,
        )

    def _next_rng(self) -> jax.Array:
        self._rng_key, k = jax.random.split(self._rng_key)
        return k

    def sample_rates(self) -> Tuple[int, int]:
        """Uniform random rate per step per modality (`:474, 549`)."""
        return (
            self._py_rng.choice(self.cfg.audio_rates),
            self._py_rng.choice(self.cfg.video_rates),
        )

    def train_step(self, batch: Dict[str, np.ndarray]) -> float:
        rate_a, rate_v = self.sample_rates()
        trim = int(batch.pop("audio_trim_len", 1500)) if "audio_trim_len" in batch else 1500
        arrays = {
            k: (v if isinstance(v, jax.Array) else jnp.asarray(v))
            for k, v in batch.items() if not isinstance(v, (int, list))
        }
        self.state, loss = self._train_step(
            self.state, self.frozen, arrays, self._next_rng(),
            rate_a=rate_a, rate_v=rate_v, trim_len=trim,
        )
        return loss

    def eval_step(self, batch: Dict[str, np.ndarray]) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        rate_a, rate_v = self.sample_rates()
        trim = int(batch.pop("audio_trim_len", 1500)) if "audio_trim_len" in batch else 1500
        arrays = {
            k: (v if isinstance(v, jax.Array) else jnp.asarray(v))
            for k, v in batch.items() if not isinstance(v, (int, list))
        }
        return self._eval_step(
            self.state, self.frozen, arrays, self._next_rng(),
            rate_a=rate_a, rate_v=rate_v, trim_len=trim,
        )

    def merged_params(self) -> Dict[str, Any]:
        t_cast = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), self.state.trainable)
        return merge_params(t_cast, self.frozen)

    # ----------------------------------------------------------------- decode

    def _decode_fn(self, modality: str, rate_a, rate_v, trim_len, num_beams: int, max_new: int):
        key = (modality, rate_a, rate_v, trim_len, num_beams, max_new,
               self.decode_attn_route, self.decode_attn_mesh)
        if key in self._decode_fns:
            return self._decode_fns[key]
        model, tok, cfg = self.model, self.tok, self.cfg
        lora_mod = modality if (cfg.llm.lora and cfg.llm.lora.task_specific) else None

        @jax.jit
        def fn(params, batch, rng):
            proc = self._preprocess(batch, rng, train=False)
            # gap-tolerant prefix: per-sample exact audio/video token counts
            # (reference batch-size-1 semantics even in batched decode)
            prefix, key_valid = model.infer_prefix_masked(
                params, proc, modality, rate_a, rate_v, trim_len
            )
            B, P0, D = prefix.shape
            P = _round_up(P0, 16)
            prefix = jnp.pad(prefix, ((0, 0), (0, P - P0), (0, 0)))
            key_valid = jnp.pad(key_valid, ((0, 0), (0, P - P0)))
            if num_beams <= 1:
                return greedy_decode(
                    params["llm"], cfg.llm, prefix,
                    max_new=max_new, eos_id=tok.eos_id, pad_id=tok.pad_id,
                    modality=lora_mod, key_valid=key_valid,
                    attn_route=self.decode_attn_route,
                    attn_mesh=self.decode_attn_mesh,
                )
            return beam_search(
                params["llm"], cfg.llm, prefix,
                num_beams=num_beams, max_new=max_new,
                eos_id=tok.eos_id, pad_id=tok.pad_id, modality=lora_mod,
                key_valid=key_valid, attn_route=self.decode_attn_route,
                attn_mesh=self.decode_attn_mesh,
            )

        self._decode_fns[key] = fn
        return fn

    def decode_batch(
        self,
        params: Dict[str, Any],
        batch: Dict[str, np.ndarray],
        modality: str,
        rate_a: Optional[int] = None,
        rate_v: Optional[int] = None,
        num_beams: Optional[int] = None,
        max_new: Optional[int] = None,
    ) -> List[str]:
        """Returns decoded transcripts for a (test) batch."""
        num_beams = self.cfg.num_beams if num_beams is None else num_beams
        max_new = self.cfg.max_dec_tokens if max_new is None else max_new
        trim = int(batch.get("audio_trim_len", 1500))
        arrays = {
            k: jnp.asarray(v) for k, v in batch.items()
            if k not in ("gold_text", "audio_trim_len")
        }
        fn = self._decode_fn(modality, rate_a, rate_v, trim, num_beams, max_new)
        ids = np.asarray(fn(params, arrays, self._next_rng()))
        out = []
        for row in ids:
            toks = [int(t) for t in row if t != self.tok.pad_id]
            if self.tok.eos_id in toks:
                toks = toks[: toks.index(self.tok.eos_id)]
            out.append(self.tok.decode(toks))
        return out
