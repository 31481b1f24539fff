"""Numerics profiles: one switch pinning every runtime toggle at once.

The framework grew a set of `OMNI_*` switches whose DEFAULTS are TPU-fast
paths (hardware PRNG streams, one-pass BN stats, fused beam selection, the
Pallas beam-attention kernel, dots-remat) — each individually justified and
parity-documented (PARITY.md "TPU-first fast paths"), but "reference-exact"
had become a multi-variable recipe. `OMNI_PROFILE=reference` pins the whole
combination in one place, so a weights-day parity run
(`cli/verify_parity.py --profile reference`) cannot silently inherit a fast
path:

    OMNI_PRNG=threefry        bit-reproducible dropout/augment streams
    OMNI_BN_STATS=twopass     textbook jnp.var batch stats
    OMNI_BEAM_SELECT=grid     full (B, K*V) HF-style candidate grid
    OMNI_BEAM_ATTN=xla        einsum+reorder beam attention
    OMNI_SELECT_KERNEL=0      no Pallas selection stats
    OMNI_CONV_KERNEL=0        XLA convs in the ResNet3D trunk
    OMNI_REMAT=off            no rematerialisation (identical numerics;
                              pinned so the backward graph is the plain one)
    OMNI_SP=0                 no sequence-parallel resharding

Config-level reference choices (whisper_input_mode="pad30s", bf16 weights,
beam 15 / 32 tokens — `Omni_AVSR/modeling_OmniAVSR.py:312-322, 528-537`)
are already the CLI defaults; the profile covers the env-var surface.

Applied at package import (omni_avsr_tpu/__init__.py) because several
readers sample their env var at import or first-trace time. An explicit
`OMNI_<X>` already present in the environment is NOT overridden — the
profile sets the baseline, a deliberate per-var override still wins (and
is printed so it cannot pass unnoticed).
"""

from __future__ import annotations

import os
from typing import Dict

REFERENCE_PROFILE: Dict[str, str] = {
    "OMNI_PRNG": "threefry",
    "OMNI_BN_STATS": "twopass",
    "OMNI_BEAM_SELECT": "grid",
    "OMNI_BEAM_ATTN": "xla",
    "OMNI_SELECT_KERNEL": "0",
    "OMNI_CONV_KERNEL": "0",
    "OMNI_REMAT": "off",
    "OMNI_SP": "0",
}

PROFILES: Dict[str, Dict[str, str]] = {
    "reference": REFERENCE_PROFILE,
    # "tpu" = the tuned defaults; an empty profile (every reader's own
    # default IS the tpu fast path)
    "tpu": {},
}


def apply_profile(name: str | None = None, verbose: bool = True) -> Dict[str, str]:
    """Apply the named profile (default: $OMNI_PROFILE) to os.environ.
    Returns the dict of variables actually set. Explicitly-set variables
    win over the profile and are reported."""
    name = name if name is not None else os.environ.get("OMNI_PROFILE", "")
    if not name:
        return {}
    if name not in PROFILES:
        raise ValueError(
            f"unknown OMNI_PROFILE {name!r} (have: {sorted(PROFILES)})")
    applied: Dict[str, str] = {}
    overridden: Dict[str, str] = {}
    for var, val in PROFILES[name].items():
        if var in os.environ and os.environ[var] != val:
            overridden[var] = os.environ[var]
            continue
        os.environ[var] = val
        applied[var] = val
    if verbose and (applied or overridden):
        msg = f"[omni-avsr-tpu] profile {name!r}: " + ", ".join(
            f"{k}={v}" for k, v in applied.items())
        if overridden:
            msg += " | explicit overrides kept: " + ", ".join(
                f"{k}={v}" for k, v in overridden.items())
        print(msg)
    return applied
