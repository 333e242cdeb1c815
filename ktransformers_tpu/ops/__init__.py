"""Core compute ops: norms, rotary embeddings, activations, routing, MoE, attention.

The TPU-native analog of the reference's `kt-kernel/operators/` family
(reference: operators/amx, operators/llamafile, operators/common.hpp) — but as
functional JAX ops + Pallas kernels instead of C++ CPU operators.
"""
