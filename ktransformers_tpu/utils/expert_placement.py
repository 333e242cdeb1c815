"""Expert placement strategies from router statistics.

Reference analogs:
- `generate_gpu_experts_masks` from activation-frequency stats
  (kt-kernel/python/experts_base.py:21-72) with strategies
  uniform / frequency / front-loading / random
  (kt-kernel/README.md:508, doc/en/kt-kernel/experts-sched-Tutorial.md),
- `--kt-enable-dynamic-expert-update` re-placement from routing stats,
- `physical_to_logical_map` expert remapping (operators/common.hpp).

On the TPU mesh the "GPU-resident hot experts" become *replicated* experts
(computed on every ep shard, skipping the psum contribution pattern is a
later optimization) and the remap becomes a frequency-balanced assignment
of experts to ep shards so each shard sees similar routed-token load.
"""

from __future__ import annotations

import numpy as np


class ExpertStatsCollector:
    """Accumulates per-layer expert activation counts from routed ids.

    Feed it topk_idx host copies during serving/eval; mirrors the .pt stat
    files the reference collects for frequency placement."""

    def __init__(self, num_layers: int, num_experts: int):
        self.counts = np.zeros((num_layers, num_experts), np.int64)

    def record(self, layer: int, topk_idx: np.ndarray) -> None:
        np.add.at(self.counts[layer], np.asarray(topk_idx).reshape(-1), 1)

    @property
    def frequencies(self) -> np.ndarray:
        tot = self.counts.sum(axis=1, keepdims=True)
        return self.counts / np.maximum(tot, 1)


def hot_expert_masks(
    freqs: np.ndarray,  # [L, E] activation frequencies
    num_hot: int,
    strategy: str = "frequency",
    seed: int = 0,
) -> np.ndarray:
    """Per-layer boolean mask of the `num_hot` experts to keep resident/
    replicated (True = hot). Strategies mirror the reference's."""
    L, E = freqs.shape
    masks = np.zeros((L, E), bool)
    if strategy == "frequency":
        for l in range(L):
            masks[l, np.argsort(-freqs[l])[:num_hot]] = True
    elif strategy == "uniform":
        step = max(E // max(num_hot, 1), 1)
        idx = (np.arange(num_hot) * step) % E
        masks[:, idx] = True
    elif strategy == "front-loading":
        masks[:, :num_hot] = True
    elif strategy == "random":
        rng = np.random.default_rng(seed)
        for l in range(L):
            masks[l, rng.choice(E, num_hot, replace=False)] = True
    else:
        raise ValueError(strategy)
    return masks


def balanced_logical_to_physical(
    freqs: np.ndarray,  # [E] one layer's frequencies
    ep_size: int,
) -> np.ndarray:
    """Greedy frequency-balanced assignment of logical experts to ep shards.

    Returns logical_to_physical [E] int32: physical slot p means the expert
    is stored at index p, living on shard p // (E/ep). Heaviest experts are
    spread across shards first (the dynamic-expert-update analog)."""
    e = len(freqs)
    per = e // ep_size
    order = np.argsort(-np.asarray(freqs))
    load = np.zeros(ep_size)
    fill = [[] for _ in range(ep_size)]
    for logical in order:
        # choose the least-loaded shard with space
        cands = sorted(
            (s for s in range(ep_size) if len(fill[s]) < per),
            key=lambda s: load[s],
        )
        s = cands[0]
        fill[s].append(logical)
        load[s] += freqs[logical]
    l2p = np.zeros(e, np.int32)
    for s in range(ep_size):
        for slot, logical in enumerate(fill[s]):
            l2p[logical] = s * per + slot
    return l2p


def reorder_expert_weights(weights, l2p: np.ndarray):
    """Apply a logical->physical map to MoEWeights: permute the expert
    axis of every per-expert array and attach the map. Composes with any
    map already applied (dynamic RE-placement during serving re-permutes
    relative to the current storage order)."""
    import jax.numpy as jnp

    from ktransformers_tpu.ops.moe import MoEWeights
    from ktransformers_tpu.quant.formats import QTensor

    e = len(l2p)
    p2l = np.zeros(e, np.int64)
    p2l[l2p] = np.arange(e)
    if weights.logical_to_physical is not None:
        # storage currently holds logical expert prev_p2l[p] at slot p;
        # new slot p must hold logical p2l[p] -> index the old storage at
        # prev_l2p[p2l[p]]
        prev_l2p = np.asarray(weights.logical_to_physical)
        perm = jnp.asarray(prev_l2p[p2l])
    else:
        perm = jnp.asarray(p2l)

    def permute_qt(qt: QTensor) -> QTensor:
        return QTensor(
            data=qt.data[perm],
            scales=None if qt.scales is None else qt.scales[perm],
            zeros=None if qt.zeros is None else qt.zeros[perm],
            kind=qt.kind,
            group_size=qt.group_size,
        )

    return MoEWeights(
        gate_up=permute_qt(weights.gate_up),
        down=permute_qt(weights.down),
        logical_to_physical=jnp.asarray(l2p),
        expert_mask=weights.expert_mask,
        lora=None
        if weights.lora is None
        else {k: v[perm] for k, v in weights.lora.items()},
    )
