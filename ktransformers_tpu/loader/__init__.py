"""Weight loaders: GGUF (k-quants) and safetensors, with HF name mapping.

TPU analog of the reference's loader stack: GGUFLoader / SafeTensorLoader
(kt-kernel/python/utils/loader.py, archive/ktransformers/util/custom_gguf.py
+ custom_loader.py). Tensors are memory-mapped and converted on demand to
either dense bf16 or a repacked `QTensor` format.
"""

from ktransformers_tpu.loader.gguf import GGUFFile, GGML_NAMES

__all__ = ["GGUFFile", "GGML_NAMES"]
