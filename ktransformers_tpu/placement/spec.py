"""Placement rules: regex-matched per-module assignment of quant / shard /
offload.

Rule anatomy mirrors the reference's
(optimize/optimize_rules/DeepSeek-V3-Chat.yaml:1-80 — `match.name` regex +
`replace.kwargs`), with TPU-native assignment keys:

```yaml
- match: {name: "layers\\.\\d+\\.moe\\.experts"}
  assign: {quant: int4_g, group_size: 128, shard: expert}
- match: {name: "layers\\.\\d+\\.attn\\..*"}
  assign: {quant: int8, shard: tensor}
- match: {name: ".*"}
  assign: {quant: bf16}
```

Module paths are the params-pytree paths ("embed", "lm_head",
"layers.3.attn.q_proj", "layers.7.moe.experts", "layers.7.moe.shared", …).
First matching rule wins (same as the reference's rule precedence).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any

import yaml


@dataclasses.dataclass(frozen=True)
class PlacementRule:
    pattern: str
    quant: str | None = None
    group_size: int | None = None
    shard: str | None = None  # "expert" | "tensor" | "replicate"
    offload: str | None = None  # None | "host"
    extra: dict = dataclasses.field(default_factory=dict)

    def matches(self, path: str) -> bool:
        return re.fullmatch(self.pattern, path) is not None


@dataclasses.dataclass
class PlacementSpec:
    rules: list[PlacementRule]
    default_quant: str = "bf16"
    default_group_size: int = 128

    @staticmethod
    def from_dict(entries: list[dict[str, Any]]) -> "PlacementSpec":
        rules = []
        for e in entries:
            match = e.get("match", {})
            assign = e.get("assign", {})
            rules.append(
                PlacementRule(
                    pattern=match.get("name", ".*"),
                    quant=assign.get("quant"),
                    group_size=assign.get("group_size"),
                    shard=assign.get("shard"),
                    offload=assign.get("offload"),
                    extra={
                        k: v
                        for k, v in assign.items()
                        if k not in ("quant", "group_size", "shard", "offload")
                    },
                )
            )
        return PlacementSpec(rules)

    @staticmethod
    def from_yaml(path_or_str: str) -> "PlacementSpec":
        if "\n" in path_or_str or ":" not in path_or_str.split("\n")[0]:
            try:
                with open(path_or_str) as f:
                    data = yaml.safe_load(f)
            except (OSError, ValueError):
                data = yaml.safe_load(path_or_str)
        else:
            data = yaml.safe_load(path_or_str)
        return PlacementSpec.from_dict(data or [])

    def resolve(self, path: str) -> PlacementRule:
        for rule in self.rules:
            if rule.matches(path):
                return rule
        return PlacementRule(pattern=".*", quant=self.default_quant)

    def quant_for(self, path: str) -> tuple[str, int]:
        r = self.resolve(path)
        return (
            r.quant or self.default_quant,
            r.group_size or self.default_group_size,
        )


def default_moe_placement(
    moe_quant: str = "int4_g", dense_quant: str = "int8"
) -> PlacementSpec:
    """The standard hetero split, analog of the reference's stock rule files:
    routed experts in the cheapest format, everything else denser."""
    return PlacementSpec.from_dict(
        [
            {
                "match": {"name": r"layers\.\d+\.(moe|mlp)\.experts.*"},
                "assign": {"quant": moe_quant},
            },
            {
                "match": {"name": r"(embed|.*norm.*)"},
                "assign": {"quant": "bf16"},
            },
            {"match": {"name": ".*"}, "assign": {"quant": dense_quant}},
        ]
    )
