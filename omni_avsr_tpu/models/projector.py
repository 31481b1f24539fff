"""Encoder->LLM projectors with matryoshka per-rate variants.

Reference: 2-layer MLP `Linear(d_enc -> 2048) ReLU Linear(2048 -> d_llm)
[LayerNorm]` (`modeling_OmniAVSR.py:65-196`). Stack-mode input dim is
d_enc * rate. Variants:

  - single projector (non-matryoshka, or `is_single_matry_projector`)
  - one projector per rate (ModuleList) — NOTE the reference quirk: in the
    per-rate branches the LayerNorm is passed as nn.Linear's third arg and
    silently dropped (`modeling_OmniAVSR.py:104, 162, 188`), so multi-
    projector variants NEVER have a LayerNorm. We reproduce that so trained
    reference checkpoints convert exactly; `force_layernorm=True` opts into
    the fixed behaviour for new training runs.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.norms import layer_norm
from .common import Params, init_layer_norm, init_linear, linear


def init_projector(
    rng: jax.Array,
    in_dim: int,
    intermediate: int,
    out_dim: int,
    with_layernorm: bool,
    dtype=jnp.float32,
) -> Params:
    k1, k2 = jax.random.split(rng)
    p: Params = {
        "fc1": init_linear(k1, in_dim, intermediate, bias=True, dtype=dtype),
        "fc2": init_linear(k2, intermediate, out_dim, bias=True, dtype=dtype),
    }
    if with_layernorm:
        p["ln"] = init_layer_norm(out_dim, dtype)
    return p


def apply_projector(params: Params, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(linear(x, params["fc1"]))
    y = linear(h, params["fc2"])
    if "ln" in params:
        y = layer_norm(y, params["ln"]["scale"], params["ln"]["bias"])
    return y


def init_matry_projectors(
    rng: jax.Array,
    rates: Sequence[int],
    enc_dim: int,
    intermediate: int,
    llm_dim: int,
    compression_mode: str,
    is_matryoshka: bool,
    is_single: bool,
    remove_layernorm: bool,
    force_layernorm: bool = False,
    dtype=jnp.float32,
) -> Params:
    """Projector bundle for one modality.

    Returns either {"single": proj} or {"per_rate": {"r{rate}": proj}}.
    LayerNorm presence per the reference decision table:
      single projector: LN unless remove_layernorm
      per-rate projectors: LN dropped (quirk) unless force_layernorm
    """
    def in_dim(rate: int) -> int:
        return enc_dim * rate if compression_mode == "stack" else enc_dim

    if not is_matryoshka or is_single:
        # non-matry stack mode: input dim scales with the single rate;
        # single-matry-projector only exists for avg-pooling (enc_dim input)
        dim = enc_dim * rates[0] if (compression_mode == "stack" and not is_matryoshka) else enc_dim
        return {
            "single": init_projector(
                rng, dim, intermediate, llm_dim,
                with_layernorm=not remove_layernorm, dtype=dtype,
            )
        }
    keys = jax.random.split(rng, len(rates))
    # Per-rate projectors: in the reference's avg-pooling branches the LN is
    # always lost to the LN-as-bias quirk (`modeling_OmniAVSR.py:104,188`),
    # and the stack branches are inconsistent (audio stack inverts the flag,
    # `:77-80`; video stack hits the quirk, `:162`). Trained checkpoints are
    # the source of truth — the converter derives LN presence from the keys
    # actually present. For fresh init we default to the published
    # avg-pooling behaviour: no LN, unless force_layernorm.
    return {
        "per_rate": {
            f"r{rate}": init_projector(
                k, in_dim(rate), intermediate, llm_dim,
                with_layernorm=force_layernorm, dtype=dtype,
            )
            for k, rate in zip(keys, rates)
        }
    }


def project(params: Params, x: jax.Array, rate: Optional[int] = None) -> jax.Array:
    if "single" in params:
        return apply_projector(params["single"], x)
    assert rate is not None
    return apply_projector(params["per_rate"][f"r{rate}"], x)
