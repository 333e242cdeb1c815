"""LoRA adapter init / merge / split / save / load.

Reference analogs: kt_adapt_peft_lora + fused expert LoRA buffers
(kt-kernel/python/sft/lora.py:137,312-585) and the adapter conversion
script (scripts/convert_kt_to_sglang_adapter.py). Adapters are stored as a
flat safetensors file keyed by params path.
"""

from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.ops.moe import MoEWeights
from ktransformers_tpu.quant.formats import QTensor


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float = 16.0
    # regex over module paths; experts covered by "experts"
    target_modules: tuple[str, ...] = (
        r".*\.attn\.(q_proj|q_a|q_b|kv_a|o_proj|k_proj|v_proj)",
        r".*\.moe\.experts",
    )
    dtype: str = "float32"

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _targets(cfg: LoRAConfig, path: str) -> bool:
    return any(re.fullmatch(p, path) for p in cfg.target_modules)


def init_lora(params, spec: ModelSpec, cfg: LoRAConfig, seed: int = 0):
    """Return a new params tree with LoRA leaves added (in place of nothing:
    base weights untouched). A is kaiming-ish random, B zeros => identity
    start. alpha/rank folded into B's scaling at apply time via init of B=0
    and scaling baked into B when trained... we fold it into A instead so
    saved adapters are self-contained."""
    rng = np.random.default_rng(seed)
    dt = jnp.dtype(cfg.dtype)

    def make(k, n):
        a = (
            rng.standard_normal((k, cfg.rank)).astype(np.float32)
            / np.sqrt(k)
            * cfg.scaling
        )
        return {
            "a": jnp.asarray(a, dt),
            "b": jnp.zeros((cfg.rank, n), dt),
        }

    def walk_layer(li, lp):
        new = dict(lp)
        attn = dict(lp["attn"])
        for key, val in list(attn.items()):
            if isinstance(val, QTensor) and _targets(
                cfg, f"layers.{li}.attn.{key}"
            ):
                attn[key + "_lora"] = make(val.in_features, val.out_features)
        new["attn"] = attn
        if "moe" in lp:
            moe = dict(lp["moe"])
            ex: MoEWeights = moe["experts"]
            if _targets(cfg, f"layers.{li}.moe.experts"):
                e = ex.num_experts
                d = ex.hidden_size
                f = ex.intermediate_size
                lora = {
                    "gate_up_a": jnp.asarray(
                        rng.standard_normal((e, d, cfg.rank)).astype(np.float32)
                        / np.sqrt(d)
                        * cfg.scaling,
                        dt,
                    ),
                    "gate_up_b": jnp.zeros((e, cfg.rank, 2 * f), dt),
                    "down_a": jnp.asarray(
                        rng.standard_normal((e, f, cfg.rank)).astype(np.float32)
                        / np.sqrt(f)
                        * cfg.scaling,
                        dt,
                    ),
                    "down_b": jnp.zeros((e, cfg.rank, d), dt),
                }
                moe["experts"] = MoEWeights(
                    gate_up=ex.gate_up,
                    down=ex.down,
                    logical_to_physical=ex.logical_to_physical,
                    expert_mask=ex.expert_mask,
                    lora=lora,
                )
            if moe.get("shared") is not None and _targets(
                cfg, f"layers.{li}.moe.shared"
            ):
                sh = dict(moe["shared"])
                for key in ("gate_up", "down"):
                    qt = sh[key]
                    sh[key + "_lora"] = make(qt.in_features, qt.out_features)
                moe["shared"] = sh
            new["moe"] = moe
        if "mlp" in lp and _targets(cfg, f"layers.{li}.mlp"):
            mlp = dict(lp["mlp"])
            for key in ("gate_up", "down"):
                qt = mlp[key]
                mlp[key + "_lora"] = make(qt.in_features, qt.out_features)
            new["mlp"] = mlp
        return new

    new_params = dict(params)
    new_params["layers"] = [
        walk_layer(li, lp) for li, lp in enumerate(params["layers"])
    ]
    return new_params


def _is_lora_path(path: tuple) -> bool:
    keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    return any(isinstance(k, str) and k.endswith("_lora") for k in keys) or (
        "lora" in [k for k in keys if isinstance(k, str)]
    )


def split_lora(params):
    """(trainable_lora, frozen_base) as same-structure trees with None holes.
    Use with jax.grad over the lora tree only."""
    lora = jax.tree_util.tree_map_with_path(
        lambda p, x: x if _is_lora_path(p) else None, params
    )
    base = jax.tree_util.tree_map_with_path(
        lambda p, x: None if _is_lora_path(p) else x, params
    )
    return lora, base


def merge_lora_params(lora, base):
    """Inverse of split_lora."""
    return jax.tree.map(
        lambda a, b: a if a is not None else b,
        lora,
        base,
        is_leaf=lambda x: x is None,
    )


def _flatten_lora(params) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if leaf is None or not _is_lora_path(path):
            continue
        name = "/".join(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in path
        )
        flat[name] = np.asarray(leaf)
    return flat


def save_lora(params, path: str) -> None:
    from safetensors.numpy import save_file

    flat = _flatten_lora(params)
    assert flat, "no LoRA leaves found"
    save_file(flat, path)


def load_lora(params, path: str):
    """Load adapter values into a params tree that already has LoRA leaves
    (same config)."""
    from safetensors import safe_open

    with safe_open(path, framework="np") as f:
        flat = {k: f.get_tensor(k) for k in f.keys()}

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for pth, leaf in leaves:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in pth
        )
        if name in flat:
            out.append(jnp.asarray(flat[name]))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
