"""OMNI_PROFILE=reference: one switch pinning the whole toggle matrix
(VERDICT r4 item 4 / weak #3).

Asserts (a) the profile lands every env toggle before import-time readers
sample them, (b) the profile's decode reproduces the token stream of the
INDIVIDUALLY-pinned combination bit-for-bit, (c) an explicit per-var
override still wins. Subprocess-based because `decoding._SELECT_MODE` et
al. are read at import."""

import json
import os
import subprocess
import sys

import pytest

_DECODE_SNIPPET = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from omni_avsr_tpu.config import LLMConfig
from omni_avsr_tpu.decode import decoding
from omni_avsr_tpu.models import llm as L

assert decoding._SELECT_MODE == os.environ.get("OMNI_BEAM_SELECT", "fused"), (
    decoding._SELECT_MODE)
cfg = LLMConfig(vocab_size=254, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                lora=None)
params = L.init_llm(jax.random.PRNGKey(0), cfg)
prefix = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64), jnp.float32)
plen = jnp.asarray([6, 6], jnp.int32)
out = decoding.beam_search(params, cfg, prefix, plen, num_beams=3, max_new=6,
                           eos_id=5, pad_id=0, cache_dtype=jnp.float32)
print("TOKENS" + json.dumps([[int(t) for t in row] for row in out]))
"""


def _run(env_extra):
    env = {k: v for k, v in os.environ.items() if not k.startswith("OMNI_")}
    env.update(env_extra)
    env.setdefault("JAX_PLATFORMS", "cpu")
    r = subprocess.run([sys.executable, "-c", _DECODE_SNIPPET],
                       capture_output=True, text=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("TOKENS")][-1]
    return json.loads(line[len("TOKENS"):]), r.stdout


@pytest.mark.slow
def test_reference_profile_matches_individual_pins():
    from omni_avsr_tpu.utils.profiles import REFERENCE_PROFILE

    tok_profile, out = _run({"OMNI_PROFILE": "reference"})
    assert "profile 'reference'" in out  # applied + announced
    tok_pinned, _ = _run(dict(REFERENCE_PROFILE))
    assert tok_profile == tok_pinned


def test_profile_sets_and_respects_overrides(monkeypatch):
    from omni_avsr_tpu.utils.profiles import REFERENCE_PROFILE, apply_profile

    for var in REFERENCE_PROFILE:
        monkeypatch.delenv(var, raising=False)
    # explicit override survives the profile
    monkeypatch.setenv("OMNI_BEAM_ATTN", "kernel")
    applied = apply_profile("reference", verbose=False)
    assert os.environ["OMNI_PRNG"] == "threefry"
    assert os.environ["OMNI_BN_STATS"] == "twopass"
    assert os.environ["OMNI_BEAM_SELECT"] == "grid"
    assert os.environ["OMNI_BEAM_ATTN"] == "kernel"  # override kept
    assert "OMNI_BEAM_ATTN" not in applied

    with pytest.raises(ValueError):
        apply_profile("nope")
    assert apply_profile("") == {}  # no profile requested
