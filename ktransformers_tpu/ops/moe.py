"""Grouped (ragged) MoE forward — the heart of the framework.

TPU re-design of the reference's MoE operator family
(kt-kernel/operators/amx/moe_base.hpp AMX_MOE_BASE::forward, the per-dtype
AMX_*_MOE_TP variants, and TP_MOE NUMA sharding in operators/moe-tp.hpp):

- The reference buckets tokens per expert with pointer arrays and runs
  per-expert AMX GEMMs over work-stealing threads. Under XLA's static shapes
  we instead *sort* the (token, expert) pairs by expert id and run a grouped
  matmul (`jax.lax.ragged_dot` on the MXU, or the Pallas fused
  dequant-grouped-matmul for quantized weights).
- `GeneralMOEConfig.gpu_experts_mask` / `should_skip_expert`
  (operators/common.hpp:242,256) — experts resident on another shard are
  skipped by routing them to the out-of-range group E, which `ragged_dot`
  zero-fills; their combine weight is also zeroed. Partial outputs from
  different shards then sum exactly like the reference's CPU+GPU partial sum.
- `physical_to_logical_map` expert remapping (operators/common.hpp) is the
  `logical_to_physical` gather applied to routed ids before dispatch.
- prefill vs decode split (moe_base.hpp:165-171): both run through the same
  sorted grouped matmul here; the Pallas kernel specializes tile sizes by
  token count instead of keeping two codepaths.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ktransformers_tpu.ops.activations import ActivationConfig, glu_activate
from ktransformers_tpu.quant.formats import (
    QTensor,
    dequantize,
    e2m1_decode,
    raw_int4_data,
    unpack_int4,
    unpack_uint4,
)

# Pallas grouped quantized matmul, registered at import time on TPU.
_PALLAS_GMM = None
# Pallas gathered (decode) expert matmul: fn(x_rows [R,K], w, ids [R]) -> [R,N]
_PALLAS_GATHER = None


def set_pallas_gmm(fn) -> None:
    global _PALLAS_GMM
    _PALLAS_GMM = fn


def set_pallas_gather(fn) -> None:
    global _PALLAS_GATHER
    _PALLAS_GATHER = fn


_PALLAS_FFN = None


def set_pallas_ffn(fn) -> None:
    """Fused decode expert-FFN kernel (gate_up -> GLU -> down in one
    launch); fn returns None when the weights/activation are ineligible."""
    global _PALLAS_FFN
    _PALLAS_FFN = fn


_PALLAS_GROUPED_FFN = None


def set_pallas_grouped_ffn(fn) -> None:
    """Fused prefill expert-FFN kernel over the sorted expert-tile layout
    (gate_up -> GLU -> down in one launch per tile); fn returns None when
    the weights/activation are ineligible."""
    global _PALLAS_GROUPED_FFN
    _PALLAS_GROUPED_FFN = fn


_PALLAS_DENSE_FFN = None


def set_pallas_dense_ffn(fn) -> None:
    """Fused dense FFN (shared experts / dense MLP layers) streamed in
    inter-dim chunks; fn returns None when ineligible."""
    global _PALLAS_DENSE_FFN
    _PALLAS_DENSE_FFN = fn


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MoEWeights:
    """Per-layer expert weights.

    gate_up: QTensor [E, hidden, 2 * inter]  (gate = [..., :inter]).
    down:    QTensor [E, inter, hidden].
    logical_to_physical: optional int32 [E_logical] expert remap.
    expert_mask: optional bool [E]; True = expert computed on this shard.
    lora: optional per-expert LoRA factors (SFT path; analog of the
      reference's fused expert LoRA, operators/amx/sft_moe.hpp):
      {"gate_up_a": [E, hidden, r], "gate_up_b": [E, r, 2*inter],
       "down_a": [E, inter, r], "down_b": [E, r, hidden]} * (alpha / r).
    """

    gate_up: QTensor
    down: QTensor
    logical_to_physical: jnp.ndarray | None = None
    expert_mask: jnp.ndarray | None = None
    lora: dict | None = None
    # number of shared experts stacked at the END of the expert arrays
    # (ops/fuse_shared.py); static: shapes the routing concat in the jaxpr
    n_shared_fused: int = dataclasses.field(
        metadata=dict(static=True), default=0
    )

    @property
    def num_experts(self) -> int:
        return self.gate_up.data.shape[0]

    @property
    def hidden_size(self) -> int:
        # int4 kinds pack two K rows per byte: data.shape[1] is K/2
        if isinstance(self.gate_up, QTensor):
            return self.gate_up.in_features
        return self.gate_up.data.shape[1]

    @property
    def intermediate_size(self) -> int:
        return self.gate_up.data.shape[2] // 2


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    """Static knobs (analog of GeneralMOEConfig, operators/common.hpp:230)."""

    activation: ActivationConfig = ActivationConfig()
    impl: str = "auto"  # auto | ref | ragged | pallas


def grouped_matmul(
    x: jnp.ndarray,
    w: QTensor,
    group_sizes: jnp.ndarray,
    *,
    impl: str = "auto",
) -> jnp.ndarray:
    """x: [m, k] rows sorted by group; w: [g, k, n]; returns [m, n].

    Rows beyond sum(group_sizes) (dropped/masked experts) come back zero.
    Per-out-channel scales are hoisted past ragged_dot (scale rows by their
    expert's scale vector after the int matmul).
    """
    if impl == "auto":
        impl = "pallas" if _PALLAS_GMM is not None else "ragged"
    if impl == "pallas" and _PALLAS_GMM is not None:
        y = _PALLAS_GMM(x, w, group_sizes)
        if y is not None:
            return y

    e = w.data.shape[0]
    gs = group_sizes.astype(jnp.int32)
    if w.kind == "bf16":
        wd = w.data.astype(x.dtype)
    elif w.kind in ("int8", "int4", "fp8"):
        if w.kind == "int4":
            codes = unpack_int4(raw_int4_data(w), w.group_size)
        else:
            codes = w.data
        y = jax.lax.ragged_dot(
            x, codes.astype(x.dtype), gs, preferred_element_type=jnp.float32
        )
        # expert id of each sorted row -> per-row output scale
        row_expert = jnp.repeat(
            jnp.arange(e), gs, total_repeat_length=x.shape[0]
        )
        s = w.scales.reshape(e, -1)[row_expert]  # [m, n]
        return (y * s).astype(x.dtype)
    else:
        wd = dequantize(w, x.dtype)
    return jax.lax.ragged_dot(
        x, wd, gs, preferred_element_type=x.dtype
    )


def _gathered_codes(w: QTensor, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather expert weight codes: w.data [E, Kp, N], ids [T, k] ->
    float32 codes [T, k, K, N] (int4/e2m1 unpacked)."""
    q = w.data[ids]
    if w.kind in ("int4", "int4_g", "int4_gz"):
        if w.act_quant:
            q = jax.lax.bitcast_convert_type(q, jnp.uint8) ^ jnp.uint8(8)
        q = unpack_int4(q, w.group_size)
    elif w.kind == "mxfp4":
        q = e2m1_decode(unpack_uint4(q, w.group_size))
    return q


def gathered_matmul(x: jnp.ndarray, w: QTensor, ids: jnp.ndarray) -> jnp.ndarray:
    """Decode-path expert matmul that only touches the routed experts' bytes.

    x: [T, K] (same input to each of the k experts) or [T, k, K]
    (per-expert inputs); w: QTensor [E, K, N]; ids: [T, k].
    Returns [T, k, N]. Analog of the reference's decode GEMV path
    (moe_base.hpp forward_decode / llamafile forward_one): bandwidth scales
    with *active* experts, not total experts.
    """
    t, k = ids.shape
    if _PALLAS_GATHER is not None:
        kdim = x.shape[-1]
        if x.ndim == 2:
            x_rows = jnp.broadcast_to(x[:, None, :], (t, k, kdim)).reshape(
                t * k, kdim
            )
        else:
            x_rows = x.reshape(t * k, kdim)
        y = _PALLAS_GATHER(x_rows, w, ids.reshape(t * k))
        if y is not None:
            return y.reshape(t, k, -1)
    q = _gathered_codes(w, ids).astype(jnp.float32)  # [T,k,K,N]
    xf = x.astype(jnp.float32)
    per_expert_x = x.ndim == 3

    if w.kind in ("bf16", "int8", "int4", "fp8"):
        eq = "ted,tedn->ten" if per_expert_x else "td,tedn->ten"
        y = jnp.einsum(eq, xf, q)
        if w.scales is not None:
            y = y * w.scales.reshape(w.data.shape[0], 1, -1)[ids].reshape(
                ids.shape[0], ids.shape[1], -1
            )
        return y.astype(x.dtype)

    # group-wise kinds
    g = w.group_size
    t, k = ids.shape
    kk, n = q.shape[-2], q.shape[-1]
    qg = q.reshape(t, k, kk // g, g, n)
    if per_expert_x:
        xg = xf.reshape(t, k, kk // g, g)
        part = jnp.einsum("teGg,teGgn->teGn", xg, qg)
        xsum = jnp.sum(xg, axis=-1)  # [t,k,G]
    else:
        xg = xf.reshape(t, kk // g, g)
        part = jnp.einsum("tGg,teGgn->teGn", xg, qg)
        xsum = jnp.sum(xg, axis=-1)[:, None]  # [t,1,G]
    scales = w.scales[ids][..., : kk // g, :]  # [t,k,G,n]; may be padded
    if w.kind in ("mxfp4", "mxfp8"):
        scales = jnp.exp2(scales.astype(jnp.float32) - 127.0)
    if w.kind.endswith("_gz"):
        part = part - xsum[..., None] * w.zeros[ids][..., : kk // g, :]
    y = jnp.sum(part * scales, axis=2)
    return y.astype(x.dtype)


def moe_dispatch(
    topk_idx: jnp.ndarray,
    num_experts: int,
    *,
    logical_to_physical: jnp.ndarray | None = None,
    expert_mask: jnp.ndarray | None = None,
):
    """Sort (token, expert) pairs by expert.

    Returns (sort_order [T*k], token_of_row [T*k], group_sizes [E],
    keep [T*k] float32 0/1 multiplier).
    """
    t, k = topk_idx.shape
    ids = topk_idx
    if logical_to_physical is not None:
        ids = logical_to_physical[ids]
    keep = jnp.ones((t, k), jnp.float32)
    if expert_mask is not None:
        local = expert_mask[ids]
        ids = jnp.where(local, ids, num_experts)
        keep = jnp.where(local, keep, 0.0)
    flat = ids.reshape(-1)
    sort_order = jnp.argsort(flat)  # stable; masked rows (id=E) go last
    token_of_row = sort_order // k
    group_sizes = jnp.bincount(flat, length=num_experts).astype(jnp.int32)
    return sort_order, token_of_row, group_sizes, keep.reshape(-1)


# gather path above this many tokens re-fetches each routed expert's
# block PER ROW (t*k grid steps); the sorted grouped path reads each
# expert once. Crossover measured r4 at serving batch 16 (96 rows):
# gather TBT 57.3 ms vs grouped 44.5 ms -> threshold 8 (single-user and
# batch-8 decode keep the gather/fused-FFN path, which wins there).
DECODE_GATHER_MAX_TOKENS = int(
    __import__("os").environ.get("KT_DECODE_GATHER_MAX_TOKENS", "8")
)


def _moe_forward_gather(
    x: jnp.ndarray,
    weights: MoEWeights,
    topk_idx: jnp.ndarray,
    topk_weights: jnp.ndarray,
    cfg: MoEConfig,
) -> jnp.ndarray:
    """Decode path: gather only the routed experts' (quantized) bytes.

    Analog of the reference's decode split (moe_base.hpp:165-171
    forward_decode, llamafile forward_one): per-token expert GEMV where HBM
    traffic scales with active experts.
    """
    t, k = topk_idx.shape
    e = weights.num_experts
    inter = weights.intermediate_size
    ids = topk_idx
    if weights.logical_to_physical is not None:
        ids = weights.logical_to_physical[ids]
    w = topk_weights
    if weights.expert_mask is not None:
        local = weights.expert_mask[ids]
        w = jnp.where(local, w, 0.0)
        ids = jnp.where(local, ids, 0)  # clamp masked to a valid index
    def lora_add(h, inp, name):
        if weights.lora is None:
            return h
        af = weights.lora[f"{name}_a"][ids].astype(jnp.float32)  # [t,k,K,r]
        bf = weights.lora[f"{name}_b"][ids].astype(jnp.float32)  # [t,k,r,N]
        inp_f = inp.astype(jnp.float32)
        eq = "ted,tedr->ter" if inp.ndim == 3 else "td,tedr->ter"
        la = jnp.einsum(eq, inp_f, af)
        return h + jnp.einsum("ter,tern->ten", la, bf).astype(h.dtype)

    if _PALLAS_FFN is not None and weights.lora is None:
        t, k = ids.shape
        kdim = x.shape[-1]
        x_rows = jnp.broadcast_to(x[:, None, :], (t, k, kdim)).reshape(
            t * k, kdim
        )
        y = _PALLAS_FFN(
            x_rows, weights.gate_up, weights.down, ids.reshape(t * k),
            cfg.activation,
        )
        if y is not None:
            y = y.reshape(t, k, -1)
            return jnp.sum(
                y * w[:, :, None].astype(y.dtype), axis=1
            ).astype(x.dtype)
    h = gathered_matmul(x, weights.gate_up, ids)  # [t,k,2F]
    h = lora_add(h, x, "gate_up")
    a = glu_activate(h[..., :inter], h[..., inter:], cfg.activation)
    y = gathered_matmul(a, weights.down, ids)  # [t,k,d]
    y = lora_add(y, a, "down")
    return jnp.sum(y * w[:, :, None].astype(y.dtype), axis=1).astype(x.dtype)


def moe_forward(
    x: jnp.ndarray,
    weights: MoEWeights,
    topk_idx: jnp.ndarray,
    topk_weights: jnp.ndarray,
    cfg: MoEConfig = MoEConfig(),
) -> jnp.ndarray:
    """Routed-expert forward.

    x: [T, hidden]; topk_idx: [T, k] int32; topk_weights: [T, k] f32.
    Matches MoE_Interface::forward(qlen, k, expert_ids, weights, in, out)
    (operators/common.hpp:404-408). Few tokens (decode) -> gather path;
    many tokens (prefill) -> sorted grouped matmul, mirroring the
    reference's decode/prefill dispatch (moe_base.hpp:165-171).
    """
    t, d = x.shape
    if not isinstance(weights.gate_up, QTensor):
        # host-offloaded experts (offload/experts.py): stream routed rows
        from ktransformers_tpu.offload.experts import moe_forward_offloaded

        return moe_forward_offloaded(x, weights, topk_idx, topk_weights, cfg)
    if cfg.impl == "gather" or (
        cfg.impl == "auto" and t <= DECODE_GATHER_MAX_TOKENS
    ):
        return _moe_forward_gather(x, weights, topk_idx, topk_weights, cfg)
    k = topk_idx.shape[-1]
    e = weights.num_experts
    inter = weights.intermediate_size

    sort_order, token_of_row, group_sizes, keep = moe_dispatch(
        topk_idx,
        e,
        logical_to_physical=weights.logical_to_physical,
        expert_mask=weights.expert_mask,
    )
    xs = x[token_of_row]  # [T*k, d]

    def lora_add(h, inp, name):
        if weights.lora is None:
            return h
        la = jax.lax.ragged_dot(
            inp,
            weights.lora[f"{name}_a"].astype(inp.dtype),
            group_sizes,
            preferred_element_type=jnp.float32,
        )
        lb = jax.lax.ragged_dot(
            la.astype(inp.dtype),
            weights.lora[f"{name}_b"].astype(inp.dtype),
            group_sizes,
            preferred_element_type=jnp.float32,
        )
        return h + lb.astype(h.dtype)

    y = None
    if (
        _PALLAS_GROUPED_FFN is not None
        and weights.lora is None
        and cfg.impl in ("auto", "pallas")
    ):
        # one launch per expert tile: the two grouped matmuls, the GLU
        # round trip, and the down-input re-quant never touch HBM
        y = _PALLAS_GROUPED_FFN(
            xs, weights.gate_up, weights.down, group_sizes, cfg.activation
        )
    if y is None:
        h = grouped_matmul(xs, weights.gate_up, group_sizes, impl=cfg.impl)
        h = lora_add(h, xs, "gate_up")
        a = glu_activate(h[:, :inter], h[:, inter:], cfg.activation)
        y = grouped_matmul(a, weights.down, group_sizes, impl=cfg.impl)
        y = lora_add(y, a, "down")

    combine = (topk_weights.reshape(-1) * keep)[sort_order]
    y = y * combine[:, None].astype(y.dtype)
    # Un-sort and reduce over the k expert copies (gather beats scatter-add
    # on TPU). The inverse permutation is a scatter of iota, not a second
    # sort (argsort is a bitonic network; the scatter is one pass).
    inv = jnp.zeros_like(sort_order).at[sort_order].set(
        jnp.arange(sort_order.shape[0], dtype=sort_order.dtype)
    )
    y = y[inv].reshape(t, k, d)
    return jnp.sum(y, axis=1).astype(x.dtype)


def moe_forward_dense_reference(
    x: jnp.ndarray,
    weights: MoEWeights,
    topk_idx: jnp.ndarray,
    topk_weights: jnp.ndarray,
    cfg: MoEConfig = MoEConfig(),
) -> jnp.ndarray:
    """O(E) dense check impl: every expert computed for every token.

    Mirrors the torch reference MoE used by the reference's accuracy tests
    (kt-kernel/test/per_commit/test_moe_amx_accuracy_int8.py moe_torch).
    Only for tests.
    """
    e = weights.num_experts
    inter = weights.intermediate_size
    gu = dequantize(weights.gate_up, jnp.float32)
    dn = dequantize(weights.down, jnp.float32)
    xf = x.astype(jnp.float32)
    h = jnp.einsum("td,edf->tef", xf, gu)
    a = glu_activate(h[..., :inter], h[..., inter:], cfg.activation)
    y = jnp.einsum("tef,efd->ted", a, dn)  # [T, E, d]
    t, k = topk_idx.shape
    ids = topk_idx
    if weights.logical_to_physical is not None:
        ids = weights.logical_to_physical[ids]
    w = topk_weights
    if weights.expert_mask is not None:
        w = jnp.where(weights.expert_mask[ids], w, 0.0)
    sel = jnp.take_along_axis(y, ids[:, :, None], axis=1)  # [T, k, d]
    return jnp.sum(sel * w[:, :, None], axis=1).astype(x.dtype)
