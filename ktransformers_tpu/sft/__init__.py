"""SFT: LoRA fine-tuning of quantized MoE models.

TPU re-design of the reference's SFT path (kt-kernel/python/sft/ +
operators/amx/sft_moe.hpp TP_MOE_SFT): the CPU forward/backward with cached
activations becomes plain JAX autodiff through the (differentiable) MoE
ops; fused per-expert LoRA lives next to the quantized base weights
(MoEWeights.lora); the frozen base never receives gradients.
"""

from ktransformers_tpu.sft.lora import (
    LoRAConfig,
    init_lora,
    load_lora,
    merge_lora_params,
    save_lora,
    split_lora,
)
from ktransformers_tpu.sft.train import TrainConfig, Trainer

__all__ = [
    "LoRAConfig",
    "init_lora",
    "merge_lora_params",
    "split_lora",
    "save_lora",
    "load_lora",
    "TrainConfig",
    "Trainer",
]
