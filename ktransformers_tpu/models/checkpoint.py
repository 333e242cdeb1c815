"""Packed-params disk cache: save/load quantized param pytrees.

Analog of the reference's pre-quantized weight cache (.kt files per expert,
operators/amx/moe.hpp:40-90 save/load + convert_cpu_weights.py output):
quantize/convert once, then load the packed QTensors directly — start-up
skips dequant+requant entirely.

Format: one `params.safetensors` (flat path-keyed arrays; bf16 stored as
uint16 views) + `manifest.json` (tree structure, QTensor kinds/group sizes,
dtypes, ModelSpec source config).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.ops.moe import MoEWeights
from ktransformers_tpu.quant.formats import QTensor


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))))
    return "/".join(parts)


def _to_np(x):
    x = np.asarray(x)
    if x.dtype == jnp.bfloat16:
        return x.view(np.uint16), "bfloat16"
    return x, str(x.dtype)


def save_params(params, out_dir: str) -> None:
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    dtypes = {}
    for path, leaf in leaves:
        if leaf is None:
            continue
        name = _path_str(path)
        arr, dt = _to_np(leaf)
        arrays[name] = np.ascontiguousarray(arr)
        dtypes[name] = dt

    # serialize structure by example: record QTensor statics along paths
    statics = {}

    def record(node, prefix):
        if isinstance(node, QTensor):
            statics[prefix] = {
                "type": "QTensor",
                "kind": node.kind,
                "group_size": node.group_size,
                "has_scales": node.scales is not None,
                "has_zeros": node.zeros is not None,
            }
            return
        if isinstance(node, MoEWeights):
            statics[prefix] = {
                "type": "MoEWeights",
                "has_l2p": node.logical_to_physical is not None,
                "has_mask": node.expert_mask is not None,
                "has_lora": node.lora is not None,
                "lora_keys": sorted(node.lora) if node.lora else [],
            }
            record(node.gate_up, prefix + "/gate_up")
            record(node.down, prefix + "/down")
            return
        if isinstance(node, dict):
            statics[prefix] = {"type": "dict", "keys": sorted(node)}
            for k, v in node.items():
                record(v, f"{prefix}/{k}")
            return
        if isinstance(node, list):
            statics[prefix] = {"type": "list", "len": len(node)}
            for i, v in enumerate(node):
                record(v, f"{prefix}/{i}")
            return
        statics[prefix] = {"type": "array"}

    record(params, "")
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({"statics": statics, "dtypes": dtypes}, f)
    save_file(arrays, os.path.join(out_dir, "params.safetensors"))


def load_params(out_dir: str):
    from safetensors import safe_open

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    statics = manifest["statics"]
    dtypes = manifest["dtypes"]
    handle = safe_open(
        os.path.join(out_dir, "params.safetensors"), framework="np"
    )
    names = set(handle.keys())

    def get_arr(name):
        if name not in names:
            return None
        arr = handle.get_tensor(name)
        if dtypes.get(name) == "bfloat16":
            return jnp.asarray(arr).view(jnp.bfloat16)
        return jnp.asarray(arr)

    def build(prefix):
        st = statics[prefix]
        t = st["type"]
        if t == "array":
            return get_arr(prefix.lstrip("/")) if prefix else get_arr("")
        if t == "QTensor":
            base = prefix.lstrip("/")
            return QTensor(
                data=get_arr(f"{base}/data"),
                scales=get_arr(f"{base}/scales") if st["has_scales"] else None,
                zeros=get_arr(f"{base}/zeros") if st["has_zeros"] else None,
                kind=st["kind"],
                group_size=st["group_size"],
            )
        if t == "MoEWeights":
            base = prefix.lstrip("/")
            lora = None
            if st.get("has_lora"):
                lora = {
                    k: get_arr(f"{base}/lora/{k}") for k in st["lora_keys"]
                }
            return MoEWeights(
                gate_up=build(prefix + "/gate_up"),
                down=build(prefix + "/down"),
                logical_to_physical=get_arr(f"{base}/logical_to_physical")
                if st["has_l2p"]
                else None,
                expert_mask=get_arr(f"{base}/expert_mask")
                if st["has_mask"]
                else None,
                lora=lora,
            )
        if t == "dict":
            return {k: build(f"{prefix}/{k}") for k in st["keys"]}
        if t == "list":
            return [build(f"{prefix}/{i}") for i in range(st["len"])]
        raise ValueError(t)

    return build("")


# ---------------------------------------------------------------------------
# streaming conversion (671B-scale checkpoints: bounded memory + resume)
# ---------------------------------------------------------------------------


def stream_convert(
    provider,
    spec,
    out_dir: str,
    quant: str = "int8",
    moe_quant: str | None = None,
    placement=None,
    exact_gguf: bool = False,
    progress=None,
) -> None:
    """Convert a checkpoint layer by layer with resume: each unit (head or
    one decoder layer) becomes its own `<unit>.safetensors` + manifest and
    is skipped when already present, so a 100s-of-GB conversion survives
    interruption with bounded peak memory (one layer's tensors). Analog of
    /root/reference/kt-kernel/scripts/convert_cpu_weights.py:1084
    (chunked conversion with --resume)."""
    from ktransformers_tpu.models.loading import build_params

    os.makedirs(out_dir, exist_ok=True)

    def unit_done(name):
        return os.path.exists(os.path.join(out_dir, name, "manifest.json"))

    def write_unit(name, tree):
        d = os.path.join(out_dir, name)
        tmp = d + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        save_params(tree, tmp)
        os.replace(tmp, d)  # atomic publish: resume never sees partials

    if not unit_done("head"):
        head = build_params(
            provider, spec, quant=quant, moe_quant=moe_quant,
            placement=placement, exact_gguf=exact_gguf, layer_indices=[],
            include_head=True,
        )
        head.pop("layers")
        write_unit("head", head)
        if progress:
            progress("head")
    for li in range(spec.num_layers):
        name = f"layer_{li:04d}"
        if unit_done(name):
            continue
        part = build_params(
            provider, spec, quant=quant, moe_quant=moe_quant,
            placement=placement, exact_gguf=exact_gguf, layer_indices=[li],
            include_head=False,
        )
        write_unit(name, part["layers"][0])
        if progress:
            progress(f"layer {li + 1}/{spec.num_layers}")
    with open(os.path.join(out_dir, "stream_manifest.json"), "w") as f:
        json.dump({"num_layers": spec.num_layers, "format": 1}, f)


def stream_load(out_dir: str):
    """Assemble params from a stream_convert directory."""
    with open(os.path.join(out_dir, "stream_manifest.json")) as f:
        meta = json.load(f)
    params = load_params(os.path.join(out_dir, "head"))
    params["layers"] = [
        load_params(os.path.join(out_dir, f"layer_{li:04d}"))
        for li in range(meta["num_layers"])
    ]
    return params
