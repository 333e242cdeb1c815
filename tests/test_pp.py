"""Pipeline-parallel executor (parallel/pp.py): GPipe schedule over a
``pp`` mesh axis must match the plain sequential layer stack exactly, in
forward and in grad (the backward pipeline comes from autodiff through
ppermute).

Reference parity: the multi-GPU layer-placement path
(archive/doc/en/multi-gpu-tutorial.md:16-27) — layers pinned to devices,
activations hopping at stage boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ktransformers_tpu.parallel.pp import (
    AXIS_PP,
    pipeline_apply,
    place_stages,
    stack_stage_params,
)


def _toy_layers(rng, n_layers, d, f):
    layers = []
    for _ in range(n_layers):
        layers.append(
            {
                "w1": jnp.asarray(rng.standard_normal((d, f)) * 0.1, jnp.float32),
                "w2": jnp.asarray(rng.standard_normal((f, d)) * 0.1, jnp.float32),
            }
        )
    return layers


def _layer_fn(lp, x, extras):
    scale = extras["scale"] if extras else 1.0
    return x + jnp.tanh(x @ lp["w1"]) @ lp["w2"] * scale


def _sequential(layers, x_mb, extras):
    out = x_mb
    for lp in layers:
        out = jax.vmap(lambda x: _layer_fn(lp, x, extras))(out)
    return out


def _pp_mesh(s):
    devs = jax.devices()[:s]
    return Mesh(np.asarray(devs), (AXIS_PP,))


@pytest.mark.parametrize("stages,m", [(4, 8), (2, 5), (4, 4)])
def test_pipeline_forward_matches_sequential(stages, m):
    rng = np.random.default_rng(0)
    n_layers, d, f, mb = 8, 16, 32, 4
    layers = _toy_layers(rng, n_layers, d, f)
    mesh = _pp_mesh(stages)
    stacked = place_stages(stack_stage_params(layers, stages), mesh)
    x = jnp.asarray(rng.standard_normal((m, mb, d)), jnp.float32)
    extras = {"scale": jnp.float32(1.5)}

    got = pipeline_apply(_layer_fn, stacked, x, mesh, extras=extras)
    want = _sequential(layers, x, extras)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6,
                               atol=2e-6)


def test_pipeline_grad_matches_sequential():
    rng = np.random.default_rng(1)
    stages, n_layers, m, mb, d, f = 4, 8, 8, 2, 8, 16
    layers = _toy_layers(rng, n_layers, d, f)
    mesh = _pp_mesh(stages)
    x = jnp.asarray(rng.standard_normal((m, mb, d)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((m, mb, d)), jnp.float32)

    stacked = stack_stage_params(layers, stages)

    def pp_loss(stacked_params):
        placed = stacked_params  # shardings applied by pipeline_apply specs
        y = pipeline_apply(_layer_fn, placed, x, mesh, extras=None)
        return jnp.mean((y - tgt) ** 2)

    def seq_loss(layer_list):
        y = _sequential(layer_list, x, None)
        return jnp.mean((y - tgt) ** 2)

    g_pp = jax.grad(pp_loss)(stacked)
    g_seq = jax.grad(seq_loss)(layers)
    # restack the sequential grads for comparison
    g_seq_stacked = stack_stage_params(g_seq, stages)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_pipeline_grad_nonzero_everywhere():
    """Every stage's params must receive gradient (catches schedules that
    silently drop microbatches at the pipeline boundaries)."""
    rng = np.random.default_rng(2)
    stages, n_layers, m, mb, d, f = 4, 4, 6, 2, 8, 8
    layers = _toy_layers(rng, n_layers, d, f)
    mesh = _pp_mesh(stages)
    x = jnp.asarray(rng.standard_normal((m, mb, d)), jnp.float32)
    stacked = stack_stage_params(layers, stages)

    def loss(p):
        return jnp.sum(pipeline_apply(_layer_fn, p, x, mesh, extras=None) ** 2)

    g = jax.grad(loss)(stacked)
    for leaf in jax.tree.leaves(g):
        norms = jnp.sum(jnp.abs(leaf), axis=tuple(range(1, leaf.ndim)))
        assert np.all(np.asarray(norms) > 0), "a stage received zero grad"


def test_pipeline_llm_matches_forward():
    """Real decoder stack (mixtral-shaped, homogeneous MoE+GQA) pipelined
    over pp=4 must reproduce the sequential forward() logits."""
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.model import KVCache, forward
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.parallel.pp import pipeline_llm_forward

    cfg = dict(
        model_type="mixtral",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
    )
    spec = spec_from_hf_config(cfg)
    params = init_params_synthetic(spec, quant="bf16", moe_quant="bf16")
    rng = np.random.default_rng(7)
    b, s = 4, 16
    tokens = jnp.asarray(rng.integers(0, 128, (b, s)), jnp.int32)

    cache = KVCache.create(spec, b, s, dtype=jnp.float32)
    want, _ = forward(params, spec, tokens, cache,
                      compute_dtype=jnp.float32)

    mesh = _pp_mesh(4)
    got = pipeline_llm_forward(
        params, spec, tokens, mesh, microbatches=2,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
