"""Expert parallelism: experts sharded over the `ep` mesh axis, partial-sum
combine via psum — the on-mesh re-design of the reference's CPU/GPU expert
split (gpu_experts_mask partial sums, operators/common.hpp:256 +
experts_base.py submit/sync), where the "two devices" become N mesh shards
and the pinned-memory round trip becomes an ICI psum.

The masked-replicated formulation (every shard sees all tokens, computes
its local experts, psums) is bandwidth-optimal for decode (weights are the
traffic, and they are already local); an all_to_all token-dispatch variant
for large prefill batches is the planned optimization (SURVEY.md §7 stage 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ktransformers_tpu.ops.moe import MoEConfig, MoEWeights, moe_forward
from ktransformers_tpu.parallel.mesh import AXIS_DP, AXIS_EP
from ktransformers_tpu.quant.formats import QTensor


def _expert_sharded_specs(weights: MoEWeights):
    """shard_map in_specs tree for MoEWeights: expert axis over `ep`."""

    def qspec(qt: QTensor):
        nd = qt.data.ndim
        dspec = P(AXIS_EP, *([None] * (nd - 1)))
        return QTensor(
            data=dspec,
            scales=None if qt.scales is None else dspec,
            zeros=None if qt.zeros is None else dspec,
            kind=qt.kind,
            group_size=qt.group_size,
        )

    return MoEWeights(
        gate_up=qspec(weights.gate_up),
        down=qspec(weights.down),
        logical_to_physical=None
        if weights.logical_to_physical is None
        else P(),
        expert_mask=None if weights.expert_mask is None else P(),
    )


def moe_forward_ep(
    x: jnp.ndarray,  # [T, d] (dp-sharded on T when dp > 1)
    weights: MoEWeights,  # experts sharded over ep
    topk_idx: jnp.ndarray,
    topk_weights: jnp.ndarray,
    cfg: MoEConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    """Expert-parallel routed forward; result matches moe_forward exactly."""
    ep_size = mesh.shape[AXIS_EP]
    if ep_size == 1:
        return moe_forward(x, weights, topk_idx, topk_weights, cfg)
    e_total = weights.num_experts
    assert e_total % ep_size == 0, (e_total, ep_size)
    e_local = e_total // ep_size

    dp = AXIS_DP if AXIS_DP in mesh.shape and mesh.shape[AXIS_DP] > 1 else None
    tok_spec = P(dp, None)

    def local_fn(x, w_local, idx, tw):
        ep = jax.lax.axis_index(AXIS_EP)
        ids_local = idx - ep * e_local
        keep = (ids_local >= 0) & (ids_local < e_local)
        ids_safe = jnp.clip(ids_local, 0, e_local - 1)
        tw_masked = jnp.where(keep, tw, 0.0)
        y = moe_forward(x, w_local, ids_safe, tw_masked, cfg)
        return jax.lax.psum(y, AXIS_EP)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(tok_spec, _expert_sharded_specs(weights), tok_spec, tok_spec),
        out_specs=tok_spec,
        check_vma=False,
    )
    return fn(x, weights, topk_idx, topk_weights)
