"""Convert HuggingFace torch model weights to the ktransformers_tpu params
pytree (used for parity tests; the file-based paths share the same builder).

Analog of the reference's weight loading (archive/ktransformers/util/
custom_loader.py + per-module .load() after injection), minus torch modules:
pure name translation + the MLA kv_b absorption split (operators/
attention.py:69-75 get_absorbed). The heavy lifting lives in
models/loading.py `build_params`.
"""

from __future__ import annotations

from ktransformers_tpu.models.loading import build_params
from ktransformers_tpu.models.spec import ModelSpec


def params_from_hf(
    model,
    spec: ModelSpec,
    quant: str = "bf16",
    moe_quant: str | None = None,
    group_size: int = 128,
):
    """Build params from a transformers *torch* model instance."""
    from ktransformers_tpu.loader.providers import TorchModelProvider

    return build_params(
        TorchModelProvider(model),
        spec,
        quant=quant,
        moe_quant=moe_quant,
        group_size=group_size,
    )
