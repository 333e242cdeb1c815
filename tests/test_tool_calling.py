"""OpenAI tool / function calling (serving/tools.py + server wiring).
Reference protocol: archive/ktransformers/tests/function_call_test.py."""

import json

pytest_plugins = "aiohttp.pytest_plugin"

import pytest

from ktransformers_tpu.serving.tools import (
    parse_tool_calls,
    render_tool_messages,
    render_tools_preamble,
)

TOOLS = [{
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get current weather",
        "parameters": {
            "type": "object",
            "properties": {"city": {"type": "string"}},
            "required": ["city"],
        },
    },
}]


def test_preamble_mentions_tools_and_format():
    pre = render_tools_preamble(TOOLS, "auto")
    assert "get_weather" in pre and "<tool_call>" in pre
    pre2 = render_tools_preamble(
        TOOLS, {"type": "function", "function": {"name": "get_weather"}}
    )
    assert "MUST call the function `get_weather`" in pre2


def test_parse_tagged_tool_call():
    text = ('Let me check.\n<tool_call>\n'
            '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
            '</tool_call>')
    content, calls = parse_tool_calls(text)
    assert content == "Let me check."
    assert len(calls) == 1
    c = calls[0]["function"]
    assert c["name"] == "get_weather"
    assert json.loads(c["arguments"]) == {"city": "Paris"}


def test_parse_bare_json_call():
    content, calls = parse_tool_calls(
        '{"name": "get_weather", "arguments": {"city": "Oslo"}}'
    )
    assert calls and calls[0]["function"]["name"] == "get_weather"


def test_parse_plain_text_no_calls():
    content, calls = parse_tool_calls("just words, no calls { } here")
    assert calls == [] and "just words" in content


def test_render_tool_messages_roundtrip():
    msgs = [
        {"role": "user", "content": "weather in Paris?"},
        {"role": "assistant", "tool_calls": [{
            "id": "call_1", "type": "function",
            "function": {"name": "get_weather",
                         "arguments": '{"city": "Paris"}'},
        }]},
        {"role": "tool", "tool_call_id": "call_1", "content": "22C sunny"},
    ]
    flat = render_tool_messages(msgs)
    assert flat[1]["role"] == "assistant"
    assert "get_weather" in flat[1]["content"]
    assert flat[2]["role"] == "user"
    assert "22C sunny" in flat[2]["content"]


async def test_http_tools_response_shape(aiohttp_client):
    """End-to-end over HTTP with a stub engine+tokenizer whose decode
    emits a canned tool call: the response must carry tool_calls and
    finish_reason 'tool_calls'."""
    import jax.numpy as jnp
    import numpy as np

    from ktransformers_tpu.models.init import init_params
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.scheduler import SchedulerConfig
    from ktransformers_tpu.serving.server import OpenAIServer

    from tests.test_generate import TINY_DS

    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    eng = ServeEngine(
        params, spec,
        SchedulerConfig(max_batch_size=2, prefill_chunk=8, page_size=8,
                        max_pages_per_query=8),
        num_pages=64, cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    eng.start()

    class ToolTok:
        eos_token_id = None

        def encode(self, text):
            return [ord(c) % 128 for c in text][:16]

        def decode(self, ids):
            return ('<tool_call>\n{"name": "get_weather", '
                    '"arguments": {"city": "Paris"}}\n</tool_call>')

        def apply_chat_template(self, messages, **kw):
            return "\n".join(
                f"{m['role']}: {m.get('content', '')}" for m in messages
            )

    try:
        srv = OpenAIServer(eng, tokenizer=ToolTok())
        client = await aiohttp_client(srv.app)
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "weather in Paris?"}],
            "tools": TOOLS,
            "max_tokens": 4,
        })
        assert r.status == 200
        data = await r.json()
        choice = data["choices"][0]
        assert choice["finish_reason"] == "tool_calls"
        call = choice["message"]["tool_calls"][0]
        assert call["function"]["name"] == "get_weather"
        assert json.loads(call["function"]["arguments"]) == {
            "city": "Paris"
        }
    finally:
        eng.stop()
