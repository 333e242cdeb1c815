"""Sharding specs for params / cache / batch over the (dp, ep, tp) mesh.

The TPU replacement for the reference's placement machinery:
- experts sharded over ``ep`` (reference: gpu_experts_mask CPU/GPU split +
  `--kt-num-gpu-experts`; here every shard owns E/ep experts and partial
  outputs are summed — the exact invariant tested in test_moe.py),
- attention heads and MLP intermediate over ``tp`` (reference: TP_MOE NUMA
  sharding / pynccl GPU TP),
- batch over ``dp``.

GSPMD consumes these PartitionSpecs through NamedSharding; XLA inserts the
psum/all-gather collectives on ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.quant.formats import QTensor

REPL = P()


def _qtensor_spec(data_spec: P) -> dict:
    """Matching specs for QTensor fields. Scales/zeros have the same rank but
    a reduced K axis ([..., 1, N] per-channel, [..., K/G, N] group), which may
    not divide the mesh axis — so the K axis of the scale spec is always
    replicated (scales are tiny)."""
    parts = list(data_spec)
    if len(parts) >= 2:
        parts[-2] = None
    scale_spec = P(*parts)
    return {"data": data_spec, "scales": scale_spec, "zeros": scale_spec}


def _map_qtensor(qt: QTensor, spec_map: dict):
    return QTensor(
        data=spec_map["data"],
        scales=None if qt.scales is None else spec_map["scales"],
        zeros=None if qt.zeros is None else spec_map["zeros"],
        kind=qt.kind,
        group_size=qt.group_size,
    )


def param_shardings(params, spec: ModelSpec, mesh: Mesh):
    """Build a params-shaped pytree of NamedShardings."""

    def q(qt: QTensor, pspec: P):
        return _map_qtensor(qt, _qtensor_spec(pspec))

    a = spec.attention
    layers = []
    for li, lp in enumerate(params["layers"]):
        attn_p = lp["attn"]
        out = {
            "input_norm": REPL,
            "post_attn_norm": REPL,
        }
        attn = {}
        if a.kind == "mla":
            for k in attn_p:
                if k == "qkv_a":
                    # fused q(_a)+kv_a (device_prep.fuse_qkv_projections):
                    # with q_lora both parts were replicated; without it the
                    # q half was head-sharded — shard N over tp in that case
                    # (ADVICE r2: don't silently fall back to replicated)
                    attn[k] = q(
                        attn_p[k],
                        P(None, None) if a.q_lora_rank else P(None, "tp"),
                    )
                elif k == "qkv_a_bias":
                    attn[k] = P(None) if a.q_lora_rank else P("tp")
                elif k == "kv_a":
                    attn[k] = q(attn_p[k], P(None, None))  # small; replicate
                elif k in ("q_proj", "q_b"):
                    attn[k] = q(attn_p[k], P(None, "tp"))  # heads over tp
                elif k == "q_a":
                    attn[k] = q(attn_p[k], P(None, None))
                elif k == "w_uk":
                    attn[k] = P("tp", None, None)
                elif k == "w_uv":
                    attn[k] = P("tp", None, None)
                elif k == "o_proj":
                    attn[k] = q(attn_p[k], P("tp", None))  # row-parallel
                elif isinstance(attn_p[k], QTensor):
                    attn[k] = q(attn_p[k], P(None, None))
                else:
                    attn[k] = REPL
        else:
            for k in attn_p:
                if k in ("q_proj", "k_proj", "v_proj", "qkv"):
                    attn[k] = q(attn_p[k], P(None, "tp"))
                elif k == "o_proj":
                    attn[k] = q(attn_p[k], P("tp", None))
                elif k in ("q_bias", "k_bias", "v_bias", "qkv_bias"):
                    attn[k] = P("tp")
                elif isinstance(attn_p[k], QTensor):
                    attn[k] = q(attn_p[k], P(None, None))
                else:
                    attn[k] = REPL
        out["attn"] = attn

        if "moe" in lp:
            moe_p = lp["moe"]
            moe = {"router_w": REPL}
            if "router_bias_corr" in moe_p:
                moe["router_bias_corr"] = REPL
            experts = moe_p["experts"]
            moe["experts"] = type(experts)(
                gate_up=q(experts.gate_up, P("ep", None, "tp")),
                down=q(experts.down, P("ep", "tp", None)),
                logical_to_physical=None
                if experts.logical_to_physical is None
                else REPL,
                expert_mask=None if experts.expert_mask is None else REPL,
            )
            if moe_p.get("shared") is not None:
                moe["shared"] = {
                    "gate_up": q(moe_p["shared"]["gate_up"], P(None, "tp")),
                    "down": q(moe_p["shared"]["down"], P("tp", None)),
                }
            if "shared_gate" in moe_p:
                moe["shared_gate"] = REPL
            out["moe"] = moe
        else:
            out["mlp"] = {
                "gate_up": q(lp["mlp"]["gate_up"], P(None, "tp")),
                "down": q(lp["mlp"]["down"], P("tp", None)),
            }
        layers.append(out)

    specs = {
        "embed": P(None, None),
        "layers": layers,
        "final_norm": REPL,
    }
    if "lm_head" in params:
        specs["lm_head"] = q(params["lm_head"], P(None, "tp"))

    return jax.tree.map(
        lambda s: NamedSharding(mesh, s) if isinstance(s, P) else s,
        specs,
        is_leaf=lambda s: isinstance(s, P),
    )


def cache_shardings(cache, spec: ModelSpec, mesh: Mesh):
    """KV cache: batch over dp; MLA ckv is head-less (replicate over tp),
    GQA kv heads over tp when they divide evenly."""
    a = spec.attention

    def buf_spec(arr):
        if a.kind == "mla":
            return NamedSharding(mesh, P("dp", None, None))
        tp = mesh.shape.get("tp", 1)
        if a.num_kv_heads % tp == 0 and tp > 1:
            return NamedSharding(mesh, P("dp", None, "tp", None))
        return NamedSharding(mesh, P("dp", None, None, None))

    return type(cache)(
        lengths=NamedSharding(mesh, P("dp")),
        bufs_a=[buf_spec(b) for b in cache.bufs_a],
        bufs_b=[buf_spec(b) for b in cache.bufs_b],
    )


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("dp", None))


def shard_params(params, spec: ModelSpec, mesh: Mesh):
    shardings = param_shardings(params, spec, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
