"""Engine-init parameter preparation for the real TPU.

Currently one one-time pass over the params pytree: the W4A8 repack
(quant/w4a8.py) for the int8-MXU decode kernels, with buffer donation so
resident expert bytes never double.

NEGATIVE RESULT, recorded so it is not retried: the decode program
layout-converts a few weight families inside every step (~340 us/step on
the bench model: attn projections {0,1}->{1,0} and experts.down.scales
{2,0,1}->{2,1,0}, destination memory space S(1) — see
scripts/profile_decode3.py). Every attempt to move those conversions to
init made decode 25-35x SLOWER (270 -> 8-11 tok/s):
  - device_put all / small / scales-only params to the default
    minor-to-major layout;
  - asking XLA for preferred entry layouts via jit in_shardings =
    Format(Layout.AUTO) and relaying to those.
The init-produced layouts are evidently what the Pallas custom calls want
on this backend, and the residual copies are XLA's own (partially
overlapped) staging into alternate memory, not an entry-layout mismatch.
Bulk relayout passes can also trip the axon runtime's transfer pool
(RESOURCE_EXHAUSTED) even with donation.

The reference stack does its analog of the *useful* part at load time:
GGUF/ST tensors are repacked once into the AMX BufferB tile layout
(kt-kernel/operators/amx/la/amx_kernels.hpp), never per step — here that
role is the w4a8 offset-lo repack.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ktransformers_tpu.quant.formats import QTensor
from ktransformers_tpu.quant.w4a8 import enable_w4a8


def _concat_out(parts):
    """Concatenate projection weights along the output (N) axis.

    Accepts plain arrays or QTensors whose static metadata matches; returns
    None when the parts cannot be merged losslessly (mixed kinds, group
    sizes, LoRA-adapted, or per-part zero-point presence differs)."""
    if all(not isinstance(t, QTensor) for t in parts):
        if len({t.dtype for t in parts}) != 1:
            return None
        return jnp.concatenate(parts, axis=-1)
    if not all(isinstance(t, QTensor) for t in parts):
        return None
    f = parts[0]
    for t in parts[1:]:
        if (
            t.kind != f.kind
            or t.group_size != f.group_size
            or t.act_quant != f.act_quant
            or t.data.dtype != f.data.dtype
            or t.data.shape[:-1] != f.data.shape[:-1]
            or (t.scales is None) != (f.scales is None)
            or (t.zeros is None) != (f.zeros is None)
            # mixed scale/zero dtypes would silently type-promote under
            # concatenate, changing what the fused kernel sees (ADVICE r2)
            or (t.scales is not None and t.scales.dtype != f.scales.dtype)
            or (t.zeros is not None and t.zeros.dtype != f.zeros.dtype)
        ):
            return None
    import dataclasses

    return dataclasses.replace(
        f,
        data=jnp.concatenate([t.data for t in parts], axis=-1),
        scales=None
        if f.scales is None
        else jnp.concatenate([t.scales for t in parts], axis=-1),
        zeros=None
        if f.zeros is None
        else jnp.concatenate([t.zeros for t in parts], axis=-1),
    )


def _out_width(t) -> int:
    return t.out_features if isinstance(t, QTensor) else t.shape[-1]


def fuse_qkv_projections(params, spec):
    """Merge the per-layer attention input projections into ONE matmul:
    MLA q(_a)+kv_a -> "qkv_a", GQA q+k+v -> "qkv" (consumed by
    models/model.py mla_qkv_proj / gqa_qkv_proj).

    Motivation: at decode batch sizes each projection launch costs
    ~5-10 us of fixed overhead against ~1-8 us of weight bytes (scripts/
    profile_decode3.py: three ~16 us attention matmuls per layer whose
    byte-ratios say they should differ 5x). The reference fuses the same
    way at load (packed gate_up_proj, kt-kernel/python/utils/loader.py:679).

    NEGATIVE RESULT on the bench model (measured, /tmp-able via
    /tmp/ab_decode.py pattern): fused decode is 257 tok/s vs 273 unfused —
    the launch savings are outweighed by XLA staging the larger fused
    weight (the per-layer S(1) copies grow with the widest matmul and
    overlap worse). Default therefore KT_FUSE_QKV=0; the path stays
    correct + tested (tests/test_fuse_qkv.py) for configs where launch
    overhead dominates harder (many tiny heads, CPU mesh experiments).

    Mutates `params` in place (old tensors are dropped); returns params.
    Skipped per-layer when formats differ or LoRA adapters are attached.
    """
    a = spec.attention
    for li, lp in enumerate(params.get("layers", [])):
        if spec.layer_kind(li) == "linear":
            continue
        p = lp.get("attn")
        if p is None:
            continue
        if a.kind == "mla":
            names = ("q_a" if a.q_lora_rank else "q_proj", "kv_a")
            # the non-lora MLA path takes no q bias (models/model.py)
            bias_keys = (
                "q_a_bias" if a.q_lora_rank else None,
                "kv_a_bias",
            )
            fkey = "qkv_a"
        else:
            names = ("q_proj", "k_proj", "v_proj")
            bias_keys = ("q_bias", "k_bias", "v_bias")
            fkey = "qkv"
        if any(n not in p or (n + "_lora") in p for n in names):
            continue
        parts = [p[n] for n in names]
        fused = _concat_out(parts)
        if fused is None:
            continue
        biases = [p.get(bk) if bk else None for bk in bias_keys]
        if any(b is not None for b in biases):
            cols = []
            for t, b in zip(parts, biases):
                cols.append(
                    b
                    if b is not None
                    else jnp.zeros((_out_width(t),), jnp.float32)
                )
            dt = next(b.dtype for b in biases if b is not None)
            p[fkey + "_bias"] = jnp.concatenate(
                [c.astype(dt) for c in cols]
            )
        p[fkey] = fused
        for n, bk in zip(names, bias_keys):
            del p[n]
            if bk and bk in p:
                p.pop(bk, None)
    return params


def prepare_params(params, pallas_active: bool, spec=None):
    """Engine-init param transforms; no-op off-TPU."""
    if not pallas_active:
        return params
    if spec is not None and os.environ.get("KT_FUSE_QKV", "0") == "1":
        params = fuse_qkv_projections(params, spec)
    if os.environ.get("KT_W4A8", "1") != "0":
        params = enable_w4a8(params, donate=True)
    return params
