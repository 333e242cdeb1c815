"""Pipeline parallelism: GPipe-style microbatched executor over a ``pp``
mesh axis.

Reference analog: the multi-GPU layer-placement path — injection rules pin
layer ranges to devices and activations hop between them
(archive/doc/en/multi-gpu-tutorial.md:16-27, `device:"cuda:1"` per-module
kwargs in the placement YAMLs). The reference moves activations with
explicit .to(device) at layer boundaries; the TPU re-design makes the hop
a `ppermute` ring over the ``pp`` mesh axis inside one jitted program, so
XLA overlaps the send/recv with the next microbatch's compute on ICI.

Design:
- Layers are grouped into S = |pp| stages, each stage's layer params
  stacked on a leading axis and sharded ``P("pp", ...)`` so every device
  holds exactly its own stage's layers (the stacked axis IS the placement
  table).
- `pipeline_apply` runs the classic GPipe schedule: M microbatches flow
  through S stages over M+S-1 ticks; device s computes its stage when
  0 <= tick - s < M, then ppermutes its activation to s+1. Bubble
  fraction = (S-1)/(M+S-1), amortized away by choosing M >> S.
- The whole schedule is one `lax.scan` inside `shard_map`, so it is
  differentiable end-to-end: `jax.grad` through `ppermute` emits the
  reverse-direction permute, which IS the backward pipeline — the SFT
  path gets pipelined backprop from autodiff instead of a hand-written
  1F1B state machine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_PP = "pp"


def stack_stage_params(layer_params: list, num_stages: int):
    """[L] list of per-layer pytrees -> stacked pytree with leading axes
    [S, L/S, ...]. All layers must share a treedef (homogeneous decoder
    stack); L must divide evenly into stages."""
    n = len(layer_params)
    if n % num_stages:
        raise ValueError(
            f"{n} layers not divisible into {num_stages} pipeline stages"
        )
    per = n // num_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)
    return jax.tree.map(
        lambda x: x.reshape((num_stages, per) + x.shape[1:]), stacked
    )


def stage_spec(stacked, mesh: Mesh):
    """NamedShardings placing each stage's slice on its pp row."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, P(AXIS_PP)), stacked
    )


def place_stages(stacked, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(AXIS_PP))), stacked
    )


def pipeline_apply(
    layer_fn,
    stage_params,  # pytree, leaves [S, L/S, ...] (sharded P("pp") on axis 0)
    x_mb: jnp.ndarray,  # [M, mb, ...] microbatched input activations
    mesh: Mesh,
    *,
    extras=None,  # pytree broadcast to every stage invocation (rope
    # tables, masks, ...) — replicated
) -> jnp.ndarray:
    """Run x through all S*L/S layers with the GPipe schedule.

    layer_fn(one_layer_params, x, extras) -> x  applies ONE layer.
    Returns [M, mb, ...] outputs (replicated across the mesh).
    """
    num_stages = mesh.shape[AXIS_PP]
    m = x_mb.shape[0]
    ticks = m + num_stages - 1

    def stage_fn(params_slice, x, extras):
        # params_slice: [1, L/S, ...] (shard_map keeps the sharded axis,
        # size 1 per device). scan over the stage's layers.
        def body(h, lp):
            return layer_fn(lp, h, extras), None

        sliced = jax.tree.map(lambda p: p[0], params_slice)
        h, _ = jax.lax.scan(body, x, sliced)
        return h

    # shard_map: stage_params split over pp; x_mb and extras replicated.
    def pipe(stage_p, x_mb, extras):
        s = jax.lax.axis_index(AXIS_PP)
        zero = jnp.zeros_like(x_mb[0])
        out_init = jnp.zeros_like(x_mb)

        def tick(carry, t):
            recv, outs = carry
            # stage 0 ingests microbatch t (while t < M); others use recv
            mb_idx = jnp.clip(t, 0, m - 1)
            x_in = jnp.where(s == 0, x_mb[mb_idx], recv)
            active = (t - s >= 0) & (t - s < m)
            y = stage_fn(stage_p, x_in, extras)
            y = jnp.where(active, y, zero)
            # last stage: record finished microbatch t-(S-1)
            done_idx = jnp.clip(t - (num_stages - 1), 0, m - 1)
            is_done = (s == num_stages - 1) & (t >= num_stages - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(is_done, y, outs[done_idx]),
                done_idx,
                axis=0,
            )
            # pass downstream (ring; the wrap last->0 is ignored)
            send = jax.lax.ppermute(
                y,
                AXIS_PP,
                [(i, (i + 1) % num_stages) for i in range(num_stages)],
            )
            return (send, outs), None

        (recv, outs), _ = jax.lax.scan(
            tick, (zero, out_init), jnp.arange(ticks)
        )
        # replicate the last stage's outputs to every device
        mask = (s == num_stages - 1).astype(outs.dtype)
        outs = jax.lax.psum(outs * mask, AXIS_PP)
        return outs

    in_specs = (
        jax.tree.map(lambda _: P(AXIS_PP), stage_params),
        P(),
        jax.tree.map(lambda _: P(), extras),
    )
    fn = jax.shard_map(
        pipe,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(),
        check_vma=False,
    )
    return fn(stage_params, x_mb, extras)


# ---------------------------------------------------------------------------
# Real-model pipeline: embed/head outside, decoder layers pipelined
# ---------------------------------------------------------------------------


def pipeline_llm_forward(
    params,
    spec,
    tokens: jnp.ndarray,  # [B, S] int32; B must divide into microbatches
    mesh: Mesh,
    *,
    microbatches: int,
    compute_dtype=jnp.bfloat16,
):
    """Full-sequence (cacheless) forward with the decoder stack pipelined
    over the ``pp`` mesh axis: embed -> GPipe(layers) -> norm -> lm_head.

    The training/prefill-shape analog of the reference's multi-GPU layer
    split. Layers must be homogeneous (stackable): models with
    first_k_dense_replace > 0 pipeline only if the dense prologue layers
    are excluded from `params["layers"]` upstream. KV buffers are
    per-microbatch scratch (fresh zeros inside each layer call), so only
    activations cross stage boundaries.
    """
    from ktransformers_tpu.models.model import decoder_layer
    from ktransformers_tpu.ops.linear import linear
    from ktransformers_tpu.ops.norm import rms_norm
    from ktransformers_tpu.ops.rope import precompute_rope_tables

    b, s = tokens.shape
    if b % microbatches:
        raise ValueError(f"batch {b} not divisible by {microbatches} mb")
    mb = b // microbatches
    num_stages = mesh.shape[AXIS_PP]

    x = params["embed"][tokens].astype(compute_dtype)
    cos_t, sin_t = precompute_rope_tables(spec.rope)
    pos = jnp.arange(s)[None, :]
    rope_cs = (
        jnp.broadcast_to(cos_t[pos], (mb, s, cos_t.shape[-1])),
        jnp.broadcast_to(sin_t[pos], (mb, s, sin_t.shape[-1])),
    )

    a = spec.attention
    if a.kind == "mla":
        buf_shapes = (
            (mb, s, a.kv_lora_rank),
            (mb, s, a.qk_rope_head_dim),
        )
    else:
        buf_shapes = (
            (mb, s, a.num_kv_heads, a.head_dim),
            (mb, s, a.num_kv_heads, a.head_dim),
        )

    def layer_fn(lp, h, extras):
        layer_cache = (
            jnp.zeros(buf_shapes[0], compute_dtype),
            jnp.zeros(buf_shapes[1], compute_dtype),
        )
        lengths = jnp.zeros((mb,), jnp.int32)
        h, _, _ = decoder_layer(
            lp, spec, h, layer_cache, lengths, extras, kind="full"
        )
        return h

    stacked = stack_stage_params(list(params["layers"]), num_stages)
    x_mb = x.reshape(microbatches, mb, s, -1)
    y = pipeline_apply(layer_fn, stacked, x_mb, mesh, extras=rope_cs)
    y = y.reshape(b, s, -1)

    y = rms_norm(y, params["final_norm"], spec.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        return y @ params["embed"].astype(y.dtype).T
    return linear(y, lm_head)
