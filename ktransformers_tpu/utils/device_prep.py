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


def _pad_out_cols(t, pad: int):
    """Zero-pad the output (N) axis of a projection weight.

    NEGATIVE RESULT (measured round 3, kept unwired — do not re-enable
    blindly): the fused qkv_a weight at N=3648 (not a 128-lane multiple)
    draws a per-step 'data formatting' staging copy (11-12 us x 27 layers,
    ~310 GB/s, bytes_accessed 2x the weight). Padding N to 3712 to kill
    the retile measured 339 -> 288 tok/s — WORSE: whatever XLA does with
    the lane-aligned operand (direct (32,128)->(8,128) int8 retiling per
    block inside Mosaic, by the look of the profile) costs more than the
    one bulk staging copy. Same session, iterative argmax top-k (k=6
    unrolled max+mask instead of lax.top_k's sort) also measured ~-10
    tok/s. Consumers now slice fused projections with explicit end bounds
    regardless, so this helper stays available for experiments."""
    if pad == 0:
        return t
    if isinstance(t, QTensor):
        import dataclasses

        return dataclasses.replace(
            t,
            data=jnp.pad(t.data, ((0, 0), (0, pad))),
            scales=None
            if t.scales is None
            else jnp.pad(
                t.scales, ((0, 0), (0, pad)), constant_values=1
            ),
            zeros=None
            if t.zeros is None
            else jnp.pad(t.zeros, ((0, 0), (0, pad))),
        )
    return jnp.pad(t, ((0, 0), (0, pad)))


def fuse_qkv_projections(params, spec):
    """Merge the per-layer attention input projections into ONE matmul:
    MLA q(_a)+kv_a -> "qkv_a", GQA q+k+v -> "qkv" (consumed by
    models/model.py mla_qkv_proj / gqa_qkv_proj).

    Motivation: at decode batch sizes each projection launch costs
    ~5-10 us of fixed overhead against ~1-8 us of weight bytes (scripts/
    profile_decode3.py: three ~16 us attention matmuls per layer whose
    byte-ratios say they should differ 5x). The reference fuses the same
    way at load (packed gate_up_proj, kt-kernel/python/utils/loader.py:679).

    History: with the r2 bf16-dequant kernels this measured NEGATIVE
    (257 vs 273 tok/s — XLA staged the larger fused weight). Re-measured
    round 3 on the W4A8 + padded-scales path it WINS: 334 vs 312 tok/s
    (scripts/ab_decode.py); the kv_a S(1) staging copies disappear with
    the kv_a launch. Default therefore KT_FUSE_QKV=1 (opt-out with 0).

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
        pad = 0  # lane-tile padding measured NEGATIVE; _pad_out_cols doc
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
            if pad:
                cols.append(jnp.zeros((pad,), dt))
            p[fkey + "_bias"] = jnp.concatenate(
                [c.astype(dt) for c in cols]
            )
        p[fkey] = fused
        for n, bk in zip(names, bias_keys):
            del p[n]
            if bk and bk in p:
                p.pop(bk, None)
    return params


def normalize_layouts(tree):
    """Rematerialize every array leaf whose device layout is not the default
    major-to-minor order.

    Motivation (round-3 HLO audit, scripts/dump_decode_hlo.py): the init
    programs leave exactly two param families in transposed layouts —
    kv_a.data s8[D,R+Dr]{0,1} and experts.down.scales f32[E,K/G,N]{2,0,1}.
    The Pallas custom calls require default layouts, so XLA re-copies those
    tensors (~180 MB, ~0.4 ms) inside EVERY decode step. One forced-layout
    copy at init removes the per-step traffic.

    NEGATIVE RESULT on axon (measured round 3, default therefore OFF): an
    array carrying an explicit Format costs ~30 ms of host work PER JIT CALL
    on this backend (4 pinned kv_a arrays alone took the 4-layer decode step
    2.0 -> 122 ms/step; the full bench model 274 -> 10.7 tok/s), dwarfing
    the ~0.2 ms/step the relayout saves. A Pallas-identity launder does not
    work either: XLA re-picks the transposed layout for the program OUTPUT
    and converts back. Keep this as an opt-in (KT_NORMALIZE_LAYOUTS=1) for
    non-axon runtimes; the per-step copies are instead attacked by fusing
    the small matmuls so the staging disappears with the launches."""
    import jax
    from jax.experimental.layout import Format, Layout

    leaves, treedef = jax.tree.flatten(tree)
    bad = []
    _default = {}
    for i, x in enumerate(leaves):
        if not isinstance(x, jax.Array) or x.ndim == 0:
            continue
        try:
            mtm = x.format.layout.major_to_minor
        except Exception:
            continue
        # the platform default is shape/dtype-dependent on this backend
        # (e.g. f32 [64,11,2048] defaults to (1,0,2)); compare against a
        # freshly-created array of the same shape/dtype
        key = (x.shape, str(x.dtype))
        if key not in _default:
            probe = jnp.zeros(x.shape, x.dtype)
            _default[key] = probe.format.layout.major_to_minor
            probe.delete()
        if mtm != _default[key]:
            bad.append(i)
    if not bad:
        return tree

    import numpy as np

    if os.environ.get("KT_NORMALIZE_VIA_HOST", "1") != "0":
        # Host round-trip: an upload always lands in the default layout and
        # carries NO explicit Format (so none of the per-call axon penalty
        # below). One-time cost = bad-leaf bytes over the tunnel.
        for i in bad:
            x = leaves[i]
            host = np.asarray(x)
            x.delete()
            leaves[i] = jax.device_put(host)
        return jax.tree.unflatten(treedef, leaves)

    groups: dict = {}
    for i in bad:
        x = leaves[i]
        groups.setdefault((x.shape, str(x.dtype)), []).append(i)
    for idxs in groups.values():
        arrs = [leaves[i] for i in idxs]
        outs = tuple(
            Format(Layout(tuple(range(a.ndim))), a.sharding) for a in arrs
        )
        fixed = jax.jit(
            lambda *xs: xs,
            out_shardings=outs,
            donate_argnums=tuple(range(len(arrs))),
        )(*arrs)
        for i, y in zip(idxs, fixed):
            leaves[i] = y
    return jax.tree.unflatten(treedef, leaves)


def bf16_absorbed_mats(params):
    """Cast the absorbed-MLA projection mats w_uk/w_uv to bf16.

    They are produced f32 by the loaders (the absorbed einsum upcasts to
    f32 anyway), so storing them f32 doubles their decode-step HBM reads:
    2 x 4.2 MB per layer on the bench model = 218 MB/step = ~0.27 ms of
    pure bandwidth. bf16 storage halves that; the einsum still accumulates
    in f32."""
    for lp in params.get("layers", []):
        attn = lp.get("attn")
        if not isinstance(attn, dict):
            continue
        for k in ("w_uk", "w_uv"):
            v = attn.get(k)
            if v is not None and hasattr(v, "dtype") and v.dtype == jnp.float32:
                attn[k] = v.astype(jnp.bfloat16)
    return params


def prepare_params(params, pallas_active: bool, spec=None):
    """Engine-init param transforms; no-op off-TPU."""
    if not pallas_active:
        return params
    if os.environ.get("KT_BF16_ABSORB", "1") != "0":
        params = bf16_absorbed_mats(params)
    if spec is not None and os.environ.get("KT_FUSE_QKV", "1") == "1":
        params = fuse_qkv_projections(params, spec)
    if os.environ.get("KT_W4A8", "1") != "0":
        params = enable_w4a8(params, donate=True)
    if os.environ.get("KT_PAD_SCALES", "1") != "0":
        # sublane-pad group scales so their default layout matches the
        # Pallas row-major constraint (kills the 26 x 9.1 us/step relayout
        # copies of experts.down.scales; quant/formats.pad_scale_sublanes)
        import jax as _jax

        from ktransformers_tpu.quant.formats import pad_scale_sublanes

        params = _jax.tree.map(
            lambda x: pad_scale_sublanes(x) if isinstance(x, QTensor) else x,
            params,
            is_leaf=lambda x: isinstance(x, QTensor),
        )
    if os.environ.get("KT_NORMALIZE_LAYOUTS", "0") == "1":
        params = normalize_layouts(params)
    return params
