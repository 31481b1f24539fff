"""Pipeline parallelism (GPipe over the pp mesh axis).

Pins that the shard_map/ppermute pipeline (`parallel/pipeline.py`) is a
drop-in for `models/llm.py::llm_backbone`: identical forward activations
and identical layer gradients (the ppermute transpose is exact), on pure-pp
and composed dp x pp meshes. The reference never activates PP (fairseq's
pipeline path is dead on the AVSR recipes); this is framework surface for
stacks that outgrow one chip's HBM.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omni_avsr_tpu.models import llm as L
from omni_avsr_tpu.parallel import pipeline as PL
from tests.test_llm import tiny_cfg


def _cfg(num_layers=4):
    import dataclasses
    return dataclasses.replace(tiny_cfg(task_specific=False),
                               num_layers=num_layers)


def _pp_mesh(pp, dp=1):
    devs = np.asarray(jax.devices()[: dp * pp]).reshape(dp, pp)
    return Mesh(devs, ("dp", PL.AXIS_PP))


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg(num_layers=4)
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    B, T = 4, 12
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (B, T, cfg.hidden_size), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    ref = L.llm_backbone(params, cfg, embeds,
                         positions=positions, mask=None, modality="audio",
                         remat=False)
    return cfg, params, embeds, ref


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (4, 4), (4, 1), (2, 4)])
def test_pipeline_forward_matches_backbone(setup, pp, microbatches):
    cfg, params, embeds, ref = setup
    mesh = _pp_mesh(pp)
    layers = PL.shard_layers(mesh, params["layers"])
    out = PL.pipeline_backbone(
        mesh, layers, cfg, embeds, modality="audio",
        num_microbatches=microbatches, remat=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_composes_with_dp(setup):
    cfg, params, embeds, ref = setup
    mesh = _pp_mesh(pp=4, dp=2)
    layers = PL.shard_layers(mesh, params["layers"])
    embeds_sharded = jax.device_put(
        embeds, NamedSharding(mesh, P(None, None, None)))
    out = PL.pipeline_backbone(
        mesh, layers, cfg, embeds_sharded, modality="audio",
        num_microbatches=2, remat=False, dp_axis="dp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_backbone(setup):
    cfg, params, embeds, _ = setup
    mesh = _pp_mesh(pp=4)
    tgt = jax.random.normal(jax.random.PRNGKey(2), embeds.shape, jnp.float32)

    def ref_loss(layers):
        p = dict(params, layers=layers)
        T = embeds.shape[1]
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                               embeds.shape[:2])
        y = L.llm_backbone(p, cfg, embeds, positions=pos, mask=None,
                           modality="audio", remat=False)
        return jnp.mean((y - tgt) ** 2)

    def pp_loss(layers):
        y = PL.pipeline_backbone(mesh, layers, cfg, embeds, modality="audio",
                                 num_microbatches=2, remat=False)
        return jnp.mean((y - tgt) ** 2)

    g_ref = jax.grad(ref_loss)(params["layers"])
    layers_sharded = PL.shard_layers(mesh, params["layers"])
    g_pp = jax.grad(pp_loss)(layers_sharded)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pp, _ = jax.tree_util.tree_flatten(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)


def test_pipeline_remat_matches(setup):
    cfg, params, embeds, ref = setup
    mesh = _pp_mesh(pp=2)
    layers = PL.shard_layers(mesh, params["layers"])
    out = PL.pipeline_backbone(mesh, layers, cfg, embeds, modality="audio",
                               num_microbatches=2, remat=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_divisibility_errors(setup):
    cfg, params, embeds, _ = setup
    mesh = _pp_mesh(pp=2)
    layers = PL.shard_layers(mesh, params["layers"])
    with pytest.raises(ValueError):
        PL.pipeline_backbone(mesh, layers, cfg, embeds, num_microbatches=3)
    # layer-divisibility guard: 4 layers on pp=8 (checked before device_put,
    # so host-resident layers exercise it directly)
    mesh8 = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8),
                 ("dp", PL.AXIS_PP))
    with pytest.raises(ValueError):
        PL.pipeline_backbone(mesh8, params["layers"], cfg, embeds,
                             num_microbatches=4)


def test_sequence_parallel_matches(setup, monkeypatch):
    """OMNI_SP=1 pins the residual stream's T axis to tp (GSPMD sequence
    parallelism) — values must match the unconstrained backbone."""
    cfg, params, embeds, ref = setup
    monkeypatch.setenv("OMNI_SP", "1")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    B, T = embeds.shape[:2]
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    with mesh:
        emb = jax.device_put(embeds, NamedSharding(mesh, P("dp")))
        out = jax.jit(
            lambda p, e: L.llm_backbone(p, cfg, e, pos, mask=None,
                                        modality="audio", remat=False)
        )(params, emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
