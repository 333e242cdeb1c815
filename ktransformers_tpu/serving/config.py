"""Server configuration: one typed object for every serve-time knob.

Reference analog: server/backend/args.py ConfigArgs + server/args.py
ArgumentParser (~80 argparse flags persisted through a YAML user config,
archive/ktransformers/server/config/config.py). Re-designed: a single
dataclass with typed fields grouped by subsystem, loadable from YAML or
JSON (`kt serve --config-file server.yaml`), with CLI flags overriding
file values and unknown keys rejected loudly (the reference silently
ignores typos — a footgun at 80 flags).
"""

from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass
class ServerConfig:
    # network
    host: str = "0.0.0.0"
    port: int = 8192
    api_key: str | None = None  # require `Authorization: Bearer <key>`
    mount_web: bool = True  # serve the chat UI at /

    # model
    model_path: str | None = None
    model_name: str = "ktransformers-tpu"
    config_path: str | None = None  # HF config.json (raw GGUF loads)
    tokenizer_path: str | None = None
    quant: str = "int8"  # dense/attention QTensor kind
    moe_quant: str = "int4_g"  # routed-expert kind
    placement_yaml: str | None = None  # per-module rules (injection analog)

    # scheduler / memory (reference: max_batch_size, chunk_size,
    # cache_lens, page_size)
    max_batch_size: int = 8
    prefill_chunk: int = 256
    page_size: int = 64
    num_pages: int = 2048
    max_pages_per_query: int = 64
    enable_prefix_cache: bool = True

    # generation defaults (per-request fields still override)
    max_new_tokens: int = 128
    temperature: float = 0.6
    top_p: float = 0.95

    # features
    offload: bool = False  # bigger-than-HBM: host-resident experts
    sparse_budget: int | None = None  # top-K-page decode attention
    sparse_anchor: str = "quest"  # anchor kind (reference AnchorType)
    sparse_retrieval: str = "layer"  # retrieval granularity
    collect_routing: bool = False  # routing stats for expert re-placement
    rebalance_interval_steps: int = 0  # 0 = never; N = re-place every N
    decode_pipeline_depth: int = 3  # in-flight decode steps (engine)

    # observability
    log_level: str = "info"
    check_numerics: bool = False

    @classmethod
    def field_names(cls) -> set[str]:
        return {f.name for f in dataclasses.fields(cls)}

    @classmethod
    def from_file(cls, path: str, **overrides) -> "ServerConfig":
        """Load YAML or JSON; `overrides` (non-None CLI values) win."""
        with open(path) as f:
            text = f.read()
        try:
            data = json.loads(text)
        except ValueError:
            import yaml

            data = yaml.safe_load(text) or {}
        if not isinstance(data, dict):
            raise ValueError(f"{path}: expected a mapping at top level")
        unknown = set(data) - cls.field_names()
        if unknown:
            raise ValueError(
                f"{path}: unknown config keys {sorted(unknown)}; "
                f"valid keys: {sorted(cls.field_names())}"
            )
        data.update({k: v for k, v in overrides.items() if v is not None})
        return cls(**data)

    def scheduler_config(self):
        from ktransformers_tpu.serving.scheduler import SchedulerConfig

        return SchedulerConfig(
            max_batch_size=self.max_batch_size,
            prefill_chunk=self.prefill_chunk,
            page_size=self.page_size,
            max_pages_per_query=self.max_pages_per_query,
        )
