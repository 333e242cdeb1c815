"""CLI + packed checkpoint tests: convert a tiny HF model dir to packed
params via the CLI, reload, and verify identical generation (the full
convert->cache->load loop)."""

import json

import jax.numpy as jnp
import numpy as np
import torch
from click.testing import CliRunner

from ktransformers_tpu.cli.main import cli
from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.models.checkpoint import load_params, save_params
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config

from tests.test_generate import TINY_DS


def _make_hf_dir(tmp_path):
    from safetensors.numpy import save_file
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, n_shared_experts=1,
        n_routed_experts=4, num_experts_per_tok=2, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False, kv_lora_rank=16,
        q_lora_rank=None, qk_rope_head_dim=8, qk_nope_head_dim=16,
        v_head_dim=16, head_dim=8, max_position_embeddings=64,
    )
    torch.manual_seed(5)
    model = DeepseekV2ForCausalLM(cfg).eval().float()
    d = tmp_path / "hfmodel"
    d.mkdir()
    sd = {k: v.detach().numpy() for k, v in model.named_parameters()}
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg.to_dict()))
    return str(d)


def test_checkpoint_roundtrip(tmp_path):
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="int8", moe_quant="int4_g")
    out = str(tmp_path / "packed")
    save_params(params, out)
    loaded = load_params(out)

    gen1 = Generator(params, spec, max_len=64, batch=1,
                     cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    gen2 = Generator(loaded, spec, max_len=64, batch=1,
                     cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    cfg = GenerateConfig(max_new_tokens=8)
    assert gen1.generate([list(range(10))], cfg) == gen2.generate(
        [list(range(10))], cfg
    )


def test_cli_convert_and_doctor(tmp_path):
    hf_dir = _make_hf_dir(tmp_path)
    out_dir = str(tmp_path / "packed")
    runner = CliRunner()
    r = runner.invoke(
        cli, ["convert", hf_dir, out_dir, "--quant", "int8",
              "--moe-quant", "int8"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output

    # reload via the packed path and generate
    from ktransformers_tpu.engine.local_chat import load_model

    spec, params = load_model(out_dir)
    gen = Generator(params, spec, max_len=64, batch=1,
                    cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    out = gen.generate([list(range(8))], GenerateConfig(max_new_tokens=4))[0]
    assert len(out) == 4

    r = runner.invoke(cli, ["doctor"], catch_exceptions=False)
    assert r.exit_code == 0
    info = json.loads(r.output)
    assert info["matmul_smoke"] == "ok"


def test_stream_convert_resume(tmp_path):
    """Layer-streamed conversion with atomic units + resume: interrupt
    after one layer, resume converts only the rest, and the assembled
    params match a one-shot build_params exactly (reference analog:
    convert_cpu_weights.py:1084 chunked conversion)."""
    import numpy as np
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    from ktransformers_tpu.loader.providers import TorchModelProvider
    from ktransformers_tpu.models.checkpoint import (
        stream_convert,
        stream_load,
    )
    from ktransformers_tpu.models.loading import build_params
    from ktransformers_tpu.models.spec import spec_from_hf_config

    cfg = DeepseekV2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=2, num_key_value_heads=2, n_shared_experts=1,
        n_routed_experts=4, num_experts_per_tok=2, first_k_dense_replace=1,
        moe_layer_freq=1, routed_scaling_factor=1.0, topk_method="greedy",
        norm_topk_prob=False, kv_lora_rank=16, q_lora_rank=None,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        max_position_embeddings=64, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = DeepseekV2ForCausalLM(cfg).eval().float()
    prov = TorchModelProvider(model)
    spec = spec_from_hf_config(cfg.to_dict())
    out = str(tmp_path / "packed")

    seen = []
    # pass 1: stop after the head + first layer (simulated interruption)
    class Stop(Exception):
        pass

    def interrupt(msg):
        seen.append(msg)
        if msg.startswith("layer 1/"):
            raise Stop

    try:
        stream_convert(prov, spec, out, quant="int8", moe_quant="int4_g",
                       progress=interrupt)
    except Stop:
        pass
    import os

    done_before = sorted(os.listdir(out))
    assert "head" in done_before and "layer_0000" in done_before

    # pass 2: resume — only the remaining layers convert
    resumed = []
    stream_convert(prov, spec, out, quant="int8", moe_quant="int4_g",
                   progress=resumed.append)
    assert not any(m == "head" or m.startswith("layer 1/") for m in resumed)

    got = stream_load(out)
    ref = build_params(prov, spec, quant="int8", moe_quant="int4_g")
    import jax

    flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_r = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    assert len(flat_g) == len(flat_r)
    for k, v in flat_g:
        rv = flat_r[jax.tree_util.keystr(k)]
        np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
