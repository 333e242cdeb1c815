"""Quantization formats and converters.

TPU analog of the reference's per-dtype weight machinery: AMX INT4/INT8
pre-repacked tiles (kt-kernel/operators/amx/la/amx_quantization.hpp, pack.hpp),
group-128 INT4 (k2-moe.hpp), AWQ/GPTQ zero-point formats (awq-moe.hpp), FP8
(fp8-moe.hpp), and the GGUF k-quant block formats (operators/llamafile).

Here, formats are dtype+scales pytrees (`QTensor`) that XLA/Pallas kernels
consume directly — layout is left to XLA except inside Pallas kernels.
"""

from ktransformers_tpu.quant.formats import (
    QTensor,
    dequantize,
    quantize,
)

__all__ = ["QTensor", "quantize", "dequantize"]
