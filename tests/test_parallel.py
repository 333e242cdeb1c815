"""Multi-device tests on the virtual 8-device CPU mesh: EP-sharded MoE must
match the single-device result exactly; the full model under a dp/ep/tp
mesh must match the unsharded model. The reference has no multi-node tests
(SURVEY.md §4); this is the mesh coverage it lacks."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.ops.gate import GateConfig, route
from ktransformers_tpu.ops.moe import MoEConfig, MoEWeights, moe_forward
from ktransformers_tpu.parallel.context import parallel_context
from ktransformers_tpu.parallel.ep import moe_forward_ep
from ktransformers_tpu.parallel.mesh import make_mesh
from ktransformers_tpu.parallel.shardings import (
    batch_sharding,
    cache_shardings,
    param_shardings,
)
from ktransformers_tpu.quant.formats import quantize

from tests.test_generate import TINY_DS


def test_moe_forward_ep_matches_single(rng):
    e, d, f, k, t = 16, 64, 96, 4, 32
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.05)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.05)
    w = MoEWeights(gate_up=quantize(gu, "bf16"), down=quantize(dn, "bf16"))
    x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    idx, wts = route(logits, GateConfig(num_experts=e, top_k=k, norm_topk_prob=True))
    cfg = MoEConfig()

    y_ref = moe_forward(x, w, idx, wts, cfg)

    mesh = make_mesh(dp=1, ep=4, tp=2)
    y_ep = moe_forward_ep(x, w, idx, wts, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(y_ep), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_moe_forward_ep_quantized(rng):
    e, d, f, k, t = 8, 64, 64, 2, 8
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.05)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.05)
    w = MoEWeights(
        gate_up=quantize(gu, "int8"), down=quantize(dn, "int8")
    )
    x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    idx, wts = route(logits, GateConfig(num_experts=e, top_k=k))
    cfg = MoEConfig()
    mesh = make_mesh(dp=1, ep=8, tp=1)
    y_ep = moe_forward_ep(x, w, idx, wts, cfg, mesh)
    y_ref = moe_forward(x, w, idx, wts, cfg)
    np.testing.assert_allclose(
        np.asarray(y_ep), np.asarray(y_ref), rtol=1e-4, atol=1e-4
    )


def test_full_model_sharded_matches_unsharded():
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 96, (2, 10)), jnp.int32)

    cache = KVCache.create(spec, 2, 16, dtype=jnp.float32)
    ref_logits, _ = forward(params, spec, tokens, cache, compute_dtype=jnp.float32)

    mesh = make_mesh(dp=2, ep=2, tp=2)
    p_sh = jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        params,
        param_shardings(params, spec, mesh),
    )
    cache2 = KVCache.create(spec, 2, 16, dtype=jnp.float32)
    cache2 = jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        cache2,
        cache_shardings(cache2, spec, mesh),
    )
    tok_sh = jax.device_put(tokens, batch_sharding(mesh))

    with mesh, parallel_context(mesh):
        fn = jax.jit(
            lambda p, t, c: forward(p, spec, t, c, compute_dtype=jnp.float32)
        )
        logits, _ = fn(p_sh, tok_sh, cache2)
        logits.block_until_ready()

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_full_model_a2a_pipelined_matches_unsharded():
    """Whole-model forward with the a2a EP impl + deferred-expert
    pipelining selected via the parallel context == single-device."""
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 96, (2, 8)), jnp.int32)

    cache = KVCache.create(spec, 2, 16, dtype=jnp.float32)
    ref_logits, _ = forward(params, spec, tokens, cache,
                            compute_dtype=jnp.float32)

    mesh = make_mesh(dp=1, ep=4, tp=2)
    p_sh = jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        params,
        param_shardings(params, spec, mesh),
    )
    cache2 = KVCache.create(spec, 2, 16, dtype=jnp.float32)
    with mesh, parallel_context(mesh, ep_impl="a2a", ep_pipeline_chunks=2):
        fn = jax.jit(
            lambda p, t, c: forward(p, spec, t, c, compute_dtype=jnp.float32)
        )
        logits, _ = fn(p_sh, tokens, cache2)
        logits.block_until_ready()

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_ep_with_prefix_of_experts_on_each_shard(rng):
    """Sanity: expert routing correctness when tokens hit experts on every
    shard (forces cross-shard psum to matter)."""
    e, d, f, t = 8, 32, 32, 4
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.1)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.1)
    w = MoEWeights(gate_up=quantize(gu, "bf16"), down=quantize(dn, "bf16"))
    x = jnp.ones((t, d), jnp.float32)
    # route token i to experts (i, i+4): spans both halves under ep=2
    idx = jnp.asarray([[i, i + 4] for i in range(t)], jnp.int32)
    wts = jnp.full((t, 2), 0.5, jnp.float32)
    mesh = make_mesh(dp=1, ep=2, tp=1)
    y_ep = moe_forward_ep(x, w, idx, wts, MoEConfig(), mesh)
    y_ref = moe_forward(x, w, idx, wts, MoEConfig())
    np.testing.assert_allclose(
        np.asarray(y_ep), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_ep_with_logical_to_physical_remap(rng):
    """reorder_expert_weights output must run correctly through BOTH EP
    paths: the remap applies to global logical ids BEFORE shard-local
    localization (regression: ADVICE r1 — localizing before the remap
    selected wrong experts)."""
    from ktransformers_tpu.parallel.ep import moe_forward_ep_a2a
    from ktransformers_tpu.utils.expert_placement import (
        balanced_logical_to_physical,
        reorder_expert_weights,
    )

    e, d, f, k, t = 16, 64, 96, 4, 32
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.05)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.05)
    w = MoEWeights(gate_up=quantize(gu, "int8"), down=quantize(dn, "int8"))
    x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    idx, wts = route(logits, GateConfig(num_experts=e, top_k=k))
    cfg = MoEConfig()
    ref = moe_forward(x, w, idx, wts, cfg)

    freqs = rng.random(e)
    l2p = balanced_logical_to_physical(freqs, ep_size=4)
    assert not np.array_equal(l2p, np.arange(e))  # a real permutation
    w_re = reorder_expert_weights(w, l2p)
    # single-device path with remap attached
    np.testing.assert_allclose(
        np.asarray(moe_forward(x, w_re, idx, wts, cfg)), np.asarray(ref),
        rtol=1e-4, atol=1e-4,
    )
    mesh = make_mesh(dp=1, ep=4, tp=1)
    y_ep = moe_forward_ep(x, w_re, idx, wts, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(y_ep), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    y_a2a = moe_forward_ep_a2a(x, w_re, idx, wts, cfg, mesh,
                               capacity_factor=8.0)
    np.testing.assert_allclose(
        np.asarray(y_a2a), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_moe_forward_ep_a2a_exact(rng):
    """all_to_all dispatch with drop-free capacity must equal the
    single-device result."""
    from ktransformers_tpu.parallel.ep import moe_forward_ep_a2a

    e, d, f, k, t = 16, 64, 96, 4, 32
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.05)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.05)
    w = MoEWeights(gate_up=quantize(gu, "bf16"), down=quantize(dn, "bf16"))
    x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    idx, wts = route(logits, GateConfig(num_experts=e, top_k=k, norm_topk_prob=True))
    cfg = MoEConfig()
    ref = moe_forward(x, w, idx, wts, cfg)

    mesh = make_mesh(dp=1, ep=4, tp=2)
    y = moe_forward_ep_a2a(x, w, idx, wts, cfg, mesh, capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_moe_forward_ep_a2a_pipelined_exact(rng):
    """Deferred-expert pipelining (chunked a2a/GEMM overlap,
    reference experts_base.py:347-455 analog) must be a pure schedule
    change: exact vs the unchunked path and the single-device result,
    including with a drop-free default capacity and odd chunk splits."""
    from ktransformers_tpu.parallel.ep import moe_forward_ep_a2a

    e, d, f, k, t = 16, 64, 96, 4, 32
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.05)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.05)
    w = MoEWeights(gate_up=quantize(gu, "bf16"), down=quantize(dn, "bf16"))
    x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    idx, wts = route(logits, GateConfig(num_experts=e, top_k=k, norm_topk_prob=True))
    cfg = MoEConfig()
    ref = moe_forward(x, w, idx, wts, cfg)
    mesh = make_mesh(dp=1, ep=4, tp=2)
    base = moe_forward_ep_a2a(x, w, idx, wts, cfg, mesh)
    for chunks in (2, 3, 4):
        y = moe_forward_ep_a2a(x, w, idx, wts, cfg, mesh,
                               pipeline_chunks=chunks)
        np.testing.assert_allclose(np.asarray(y), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_moe_forward_ep_a2a_drops_overflow(rng):
    """With tiny capacity, overflow slots contribute zero (never garbage)."""
    from ktransformers_tpu.parallel.ep import moe_forward_ep_a2a

    e, d, f, k, t = 8, 32, 48, 2, 16
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.05)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.05)
    w = MoEWeights(gate_up=quantize(gu, "bf16"), down=quantize(dn, "bf16"))
    x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    # all tokens to experts 0 and 1 (shard 0 under ep=2) -> heavy overflow
    idx = jnp.zeros((t, k), jnp.int32).at[:, 1].set(1)
    wts = jnp.full((t, k), 0.5, jnp.float32)
    mesh = make_mesh(dp=1, ep=2, tp=1)
    y = moe_forward_ep_a2a(x, w, idx, wts, MoEConfig(), mesh,
                           capacity_factor=0.5)
    assert np.isfinite(np.asarray(y)).all()
    # exact with generous capacity
    y_full = moe_forward_ep_a2a(x, w, idx, wts, MoEConfig(), mesh,
                                capacity_factor=16.0)
    ref = moe_forward(x, w, idx, wts, MoEConfig())
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_paged_forward_sharded_matches_unsharded():
    """Serving path on the mesh: forward_paged with ep/tp-sharded params,
    dp-sharded tokens/tables, replicated page pool == single-device paged
    forward (the multi-device serving evidence VERDICT r1 item 6 asks)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ktransformers_tpu.cache.paged import PagedKVCache
    from ktransformers_tpu.models.paged import forward_paged

    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 96, (2, 8)), jnp.int32)
    tables = jnp.asarray(
        1 + np.arange(4, dtype=np.int32).reshape(2, 2)
    )
    lengths = jnp.zeros((2,), jnp.int32)

    kv = PagedKVCache.create(spec, num_pages=8, page_size=8, dtype=jnp.float32)
    ref, _ = forward_paged(
        params, spec, tokens, kv, tables, lengths, compute_dtype=jnp.float32
    )

    mesh = make_mesh(dp=2, ep=2, tp=2)
    p_sh = jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        params,
        param_shardings(params, spec, mesh),
    )
    kv2 = PagedKVCache.create(spec, num_pages=8, page_size=8, dtype=jnp.float32)
    repl = NamedSharding(mesh, P())
    kv2 = jax.tree.map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, kv2
    )
    dp2 = NamedSharding(mesh, P("dp", None))
    tok_sh = jax.device_put(tokens, dp2)
    tab_sh = jax.device_put(tables, dp2)
    len_sh = jax.device_put(lengths, NamedSharding(mesh, P("dp")))

    with mesh, parallel_context(mesh):
        fn = jax.jit(
            lambda p, t, k, pt, ln: forward_paged(
                p, spec, t, k, pt, ln, compute_dtype=jnp.float32
            )
        )
        logits, _ = fn(p_sh, tok_sh, kv2, tab_sh, len_sh)
        logits.block_until_ready()

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
