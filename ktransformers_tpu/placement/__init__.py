"""Module-to-mesh placement spec.

The TPU re-imagination of the reference's YAML injection framework
(archive/ktransformers/optimize/optimize.py + optimize_rules/*.yaml): the
reference matches torch modules by name-regex/class and swaps them for
K-operator implementations with per-module device/backend kwargs; here the
same match ergonomics assign each module a **quant format**, a **mesh
sharding**, and an **offload policy** — the decisions that matter on TPU.
"""

from ktransformers_tpu.placement.spec import PlacementRule, PlacementSpec

__all__ = ["PlacementRule", "PlacementSpec"]
