"""Shipped placement-rule library: tuned per-preset YAML placement specs.

The analog of the reference's stock rule files
(archive/ktransformers/optimize/optimize_rules/ — 34 tuned per-model/
per-GPU-count YAMLs consumed by `--optimize_config_path`): one tuned file
per registry preset (models/registry.py), selecting quant kind, group
size, shard layout and offload policy per module-path regex. Load by
preset name; `kt chat/serve --placement <name-or-path>` accepts either a
library name or a YAML file path.
"""

from __future__ import annotations

import os

from ktransformers_tpu.placement.spec import PlacementSpec

RULES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "rules")


def available_placements() -> list[str]:
    """Names of the shipped placement rule files (registry preset names)."""
    return sorted(
        f[: -len(".yaml")]
        for f in os.listdir(RULES_DIR)
        if f.endswith(".yaml")
    )


def load_placement(name_or_path: str,
                   mesh_size: int | None = None) -> PlacementSpec:
    """Load a placement spec by library name or YAML file path.

    mesh_size: prefer a per-mesh-size variant ("<name>-<N>chip.yaml",
    the analog of the reference's *-multi-gpu-N.yaml files) when one is
    shipped; falls back to the base file.
    """
    if os.sep not in name_or_path:
        if mesh_size and mesh_size > 1:
            var = os.path.join(
                RULES_DIR, f"{name_or_path}-{mesh_size}chip.yaml"
            )
            if os.path.exists(var):
                return PlacementSpec.from_yaml(var)
        lib = os.path.join(RULES_DIR, name_or_path + ".yaml")
        if os.path.exists(lib):
            return PlacementSpec.from_yaml(lib)
    return PlacementSpec.from_yaml(name_or_path)
