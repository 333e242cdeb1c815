"""Fuse shared experts into the routed gather (single-chip decode
optimization).

Per decode step the r1 layer issued 4 MoE kernel calls (routed gate_up/
down gathers + shared gate_up/down dense matmuls) and a separate
combine. When the shared experts have the SAME intermediate size as the
routed ones (DeepSeek: n_shared experts of moe_intermediate_size —
exactly routed-expert-shaped), they can ride the gathered kernel as
always-selected extra expert rows with combine weight 1.0 (or the
qwen2-style sigmoid gate value), halving the kernel-call count of the
MoE half of every layer. Reference analog: the fused
shared+routed dispatch in kt-kernel's AMX MoE (moe_base.hpp treats
shared experts as rows of the same buffer pool)."""

from __future__ import annotations

import jax.numpy as jnp

from ktransformers_tpu.ops.moe import MoEWeights
from ktransformers_tpu.quant.formats import QTensor


def fuse_shared_experts(params, spec, requantize: bool = False):
    """Return params where each MoE layer's shared experts are appended to
    the routed expert arrays (flag n_shared_fused on the moe dict). Falls
    back to the original layer when shapes don't allow stacking (shared
    intermediate != n_shared * routed intermediate, quant mismatch, LoRA,
    gates handled; zero-centered etc. unaffected)."""
    m = spec.moe
    if m is None or not m.shared_expert_intermediate_size:
        return params
    f = m.moe_intermediate_size
    n_sh = m.shared_expert_intermediate_size // f
    if n_sh * f != m.shared_expert_intermediate_size:
        return params
    # down K-axis slicing must stay scale-group aligned
    gs = params["layers"][-1].get("moe", {}).get("experts")
    if gs is not None and gs.down.group_size and f % gs.down.group_size:
        return params

    # Replace layers IN PLACE so each layer's old expert buffers free
    # before the next layer's concat: building a full second copy of the
    # expert arrays peaks at 2x the model and OOMs a 10 GB model on the
    # 16 GB chip.
    layers = params["layers"]
    for li in range(len(layers)):
        lp = layers[li]
        if "moe" not in lp or "shared" not in lp["moe"]:
            continue
        moe = dict(lp["moe"])
        w: MoEWeights = moe["experts"]
        sh = moe["shared"]
        gu_sh, dn_sh = sh["gate_up"], sh["down"]
        if requantize and (
            gu_sh.kind != w.gate_up.kind
            or gu_sh.group_size != w.gate_up.group_size
        ):
            # re-express the shared weights in the routed kind (bench /
            # explicit opt-in: a quant-kind change, not value-exact)
            from ktransformers_tpu.quant.formats import dequantize, quantize

            gu_sh = quantize(
                dequantize(gu_sh, jnp.float32), w.gate_up.kind,
                group_size=w.gate_up.group_size or 128,
            )
            dn_sh = quantize(
                dequantize(dn_sh, jnp.float32), w.down.kind,
                group_size=w.down.group_size or 128,
            )
        same_kind = (
            gu_sh.kind == w.gate_up.kind
            and gu_sh.group_size == w.gate_up.group_size
            and dn_sh.kind == w.down.kind
            and w.lora is None
            and w.logical_to_physical is None
            and w.expert_mask is None
        )
        if not same_kind:
            continue

        def col(qt, lo, hi):
            return (
                qt.data[..., lo:hi],
                None if qt.scales is None else qt.scales[..., lo:hi],
                None if qt.zeros is None else qt.zeros[..., lo:hi],
            )

        # shared gate_up [hidden, 2*n*f] -> n experts of [hidden, 2f]
        gu_parts = []
        for i in range(n_sh):
            gd, gs, gz = col(gu_sh, i * f, (i + 1) * f)
            ud, us, uz = col(
                gu_sh, (n_sh + i) * f, (n_sh + i + 1) * f
            )
            gu_parts.append(
                (
                    jnp.concatenate([gd, ud], -1)[None],
                    None if gs is None else jnp.concatenate([gs, us], -1)[None],
                    None if gz is None else jnp.concatenate([gz, uz], -1)[None],
                )
            )
        # shared down [n*f, hidden] -> n experts of [f, hidden]; K-axis
        # slicing must respect packed-nibble rows for int4 kinds
        dn_parts = []
        pack = dn_sh.kind in ("int4", "int4_g", "int4_gz", "mxfp4")
        rows_per_f = f // 2 if pack else f
        gpf = None if dn_sh.scales is None else dn_sh.scales.shape[-2] // n_sh
        for i in range(n_sh):
            dd = dn_sh.data[i * rows_per_f : (i + 1) * rows_per_f]
            ds = (
                None if dn_sh.scales is None
                else dn_sh.scales[i * gpf : (i + 1) * gpf]
            )
            dz = (
                None if dn_sh.zeros is None
                else dn_sh.zeros[i * gpf : (i + 1) * gpf]
            )
            dn_parts.append((dd[None], ds, dz))

        def cat(qt, parts):
            data = jnp.concatenate([qt.data] + [p[0] for p in parts], 0)
            scales = qt.scales
            if scales is not None:
                extra = [
                    p[1] if p[1] is not None and p[1].ndim == scales.ndim
                    else p[1][None]
                    for p in parts
                ]
                scales = jnp.concatenate([scales] + extra, 0)
            zeros = qt.zeros
            if zeros is not None:
                extra = [
                    p[2] if p[2] is not None and p[2].ndim == zeros.ndim
                    else p[2][None]
                    for p in parts
                ]
                zeros = jnp.concatenate([zeros] + extra, 0)
            return QTensor(data, scales, zeros, kind=qt.kind,
                           group_size=qt.group_size)

        new_gu = cat(w.gate_up, gu_parts)
        new_dn = cat(w.down, dn_parts)
        import jax

        jax.block_until_ready(new_gu.data)
        moe["experts"] = MoEWeights(
            gate_up=new_gu, down=new_dn, n_shared_fused=n_sh,
        )
        moe.pop("shared")
        # drop the old buffers before the next layer's concat
        del w, gu_sh, dn_sh, gu_parts, dn_parts, new_gu, new_dn
        layers[li] = {**lp, "moe": moe}
        lp = None
    return params
