"""HTTP API tests via aiohttp's test utilities (reference analog: the
HTTP-level harnesses in archive/ktransformers/tests/)."""

import json

import jax.numpy as jnp
import pytest

pytest_plugins = "aiohttp.pytest_plugin"

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.serving.engine import ServeEngine
from ktransformers_tpu.serving.scheduler import SchedulerConfig
from ktransformers_tpu.serving.server import OpenAIServer

from tests.test_generate import TINY_DS


@pytest.fixture(scope="module")
def engine():
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    eng = ServeEngine(
        params,
        spec,
        SchedulerConfig(max_batch_size=2, prefill_chunk=8, page_size=8,
                        max_pages_per_query=8),
        num_pages=64,
        cache_dtype=jnp.float32,
        compute_dtype=jnp.float32,
    )
    eng.start()
    yield eng
    eng.stop()


@pytest.fixture
async def client(engine, aiohttp_client):
    srv = OpenAIServer(engine)
    return await aiohttp_client(srv.app)


async def test_health_and_models(client):
    r = await client.get("/health")
    assert (await r.json())["status"] == "ok"
    r = await client.get("/v1/models")
    data = await r.json()
    assert data["data"][0]["id"] == "ktransformers-tpu"


async def test_chat_completion(client):
    r = await client.post(
        "/v1/chat/completions",
        json={
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 5,
        },
    )
    assert r.status == 200
    data = await r.json()
    assert data["object"] == "chat.completion"
    assert len(data["choices"][0]["message"]["content"]) == 5
    assert data["usage"]["completion_tokens"] == 5
    assert data["choices"][0]["finish_reason"] == "length"


async def test_completion_with_token_ids(client):
    r = await client.post(
        "/v1/completions",
        json={"prompt": list(range(6)), "max_tokens": 4},
    )
    data = await r.json()
    assert data["usage"]["prompt_tokens"] == 6
    assert data["usage"]["completion_tokens"] == 4


async def test_streaming(client):
    r = await client.post(
        "/v1/chat/completions",
        json={
            "messages": [{"role": "user", "content": "stream test"}],
            "max_tokens": 4,
            "stream": True,
        },
    )
    assert r.status == 200
    raw = (await r.read()).decode()
    events = [
        json.loads(line[6:])
        for line in raw.splitlines()
        if line.startswith("data: ") and line != "data: [DONE]"
    ]
    deltas = [
        e["choices"][0].get("delta", {}).get("content")
        for e in events
        if e["choices"][0].get("delta", {}).get("content")
    ]
    assert len(deltas) == 4
    assert raw.strip().endswith("data: [DONE]")
    assert events[-1]["choices"][0]["finish_reason"] == "length"


async def test_metrics(client):
    # generate something first so counters move
    await client.post(
        "/v1/completions", json={"prompt": [1, 2, 3], "max_tokens": 2}
    )
    r = await client.get("/metrics")
    text = await r.text()
    assert "ktransformers_tpu_queries_finished" in text
    assert "ktransformers_tpu_engine_steps" in text


async def test_webui(client):
    """The built-in chat page (reference website analog) is served at /."""
    for path in ("/", "/web"):
        r = await client.get(path)
        assert r.status == 200
        assert r.content_type == "text/html"
        body = await r.text()
        assert "ktransformers-tpu" in body
        assert "/v1/chat/completions" in body  # talks to the real API


async def test_ollama_endpoints(client):
    r = await client.get("/api/tags")
    assert (await r.json())["models"][0]["name"] == "ktransformers-tpu"
    r = await client.post(
        "/api/generate",
        json={"prompt": "hi", "options": {"num_predict": 3}},
    )
    data = await r.json()
    assert data["done"] and data["eval_count"] == 3
    r = await client.post(
        "/api/chat",
        json={
            "messages": [{"role": "user", "content": "yo"}],
            "options": {"num_predict": 2},
        },
    )
    data = await r.json()
    assert data["message"]["role"] == "assistant"
    assert len(data["message"]["content"]) == 2
