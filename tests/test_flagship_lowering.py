"""Flagship-geometry SPMD lowering: AOT-compile the FULL-SIZE
(Llama-3.2-1B + Whisper-medium + AV-HuBERT-Large) train step and beam-15
decode over an 8-device (dp=4, tp=2) mesh — no execution, no parameter
materialization. Catches vocab/head divisibility and partition-spec
mismatches that tiny dryrun shapes hide
(geometry: `Omni_AVSR/modeling_OmniAVSR.py:56-214`)."""

import pytest

pytestmark = pytest.mark.slow


def test_aot_flagship_train_and_decode_compile():
    import __graft_entry__ as g

    res = g.aot_flagship_multichip(8)
    # liveness: both programs produced a real executable with real FLOPs
    assert res["train"] > 1e11  # ~0.54 TFLOP measured for the B8/F128 step
    assert res["decode"] > 1e10


def test_suffix_specs_cover_opt_state_paths():
    """The AOT check's value hinges on the optimizer state getting the same
    shardings as its parameters — verify the suffix matcher reaches into
    optax-state paths."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import __graft_entry__ as g
    from omni_avsr_tpu.parallel.partitioning import LLM_RULES

    tree = {
        "opt": {
            "mu": {"llm": {"layers": {"attn": {"q": {"w": jnp.zeros((2, 8, 8))}}}}},
        },
        "step": jnp.zeros(()),
    }
    specs = g._suffix_specs(tree, LLM_RULES)
    assert specs["opt"]["mu"]["llm"]["layers"]["attn"]["q"]["w"] == P(None, None, "tp")
    assert specs["step"] == P()
