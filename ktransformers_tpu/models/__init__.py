"""Model zoo: one parameterized TPU decoder + per-family HF config translators.

Replaces the reference's per-model HF modeling copies and injected K-modules
(archive/ktransformers/models/*, archive/ktransformers/operators/experts.py
KDeepseekV3MoE / KQwen2MoeSparseMoeBlock / KMistralSparseMoEBlock, and the
custom_modeling_* flattened graphs): instead of patching torch module trees,
every supported family is a `ModelSpec` feeding a single functional decoder
(`models.model`).
"""

from ktransformers_tpu.models.spec import (
    AttentionSpec,
    MoESpec,
    ModelSpec,
    spec_from_hf_config,
)

__all__ = ["AttentionSpec", "MoESpec", "ModelSpec", "spec_from_hf_config"]
