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


async def test_assistants_api(client):
    """Assistants v2 subset (reference server/api/openai/assistants):
    assistant -> thread -> message -> run lifecycle, with the run's
    completion appended to the thread."""
    import asyncio

    r = await client.post(
        "/v1/assistants",
        json={"name": "helper", "instructions": "be brief"},
    )
    a = await r.json()
    assert a["object"] == "assistant" and a["id"].startswith("asst_")

    r = await client.get("/v1/assistants")
    assert len((await r.json())["data"]) >= 1

    r = await client.post("/v1/threads", json={})
    t = await r.json()
    assert t["id"].startswith("thread_")

    r = await client.post(
        f"/v1/threads/{t['id']}/messages",
        json={"role": "user", "content": "hello"},
    )
    m = await r.json()
    assert m["content"][0]["text"]["value"] == "hello"

    r = await client.post(
        f"/v1/threads/{t['id']}/runs",
        json={"assistant_id": a["id"], "max_completion_tokens": 4},
    )
    run = await r.json()
    assert run["status"] in ("queued", "in_progress")

    for _ in range(400):
        r = await client.get(f"/v1/threads/{t['id']}/runs/{run['id']}")
        got = await r.json()
        if got["status"] == "completed":
            break
        await asyncio.sleep(0.05)
    assert got["status"] == "completed"

    r = await client.get(f"/v1/threads/{t['id']}/messages")
    msgs = (await r.json())["data"]
    assert msgs[-1]["role"] == "assistant"
    assert len(msgs[-1]["content"][0]["text"]["value"]) == 4

    r = await client.delete(f"/v1/assistants/{a['id']}")
    assert (await r.json())["deleted"]

    r = await client.get("/v1/threads/nope")
    assert r.status == 404


async def test_api_key_auth(engine, aiohttp_client):
    """--api_key analog: /v1 + /api require the bearer token; health,
    metrics and the chat page stay open."""
    srv = OpenAIServer(engine, api_key="sekrit")
    c = await aiohttp_client(srv.app)
    r = await c.get("/v1/models")
    assert r.status == 401
    r = await c.post("/v1/completions", json={"prompt": [1], "max_tokens": 1})
    assert r.status == 401
    r = await c.get("/v1/models",
                    headers={"Authorization": "Bearer sekrit"})
    assert r.status == 200
    for open_path in ("/health", "/metrics", "/"):
        r = await c.get(open_path)
        assert r.status == 200, open_path


async def test_mount_web_off(engine, aiohttp_client):
    srv = OpenAIServer(engine, mount_web=False)
    c = await aiohttp_client(srv.app)
    assert (await c.get("/")).status == 404
    assert (await c.get("/health")).status == 200


def test_server_config_file(tmp_path):
    """ServerConfig loads YAML/JSON, rejects unknown keys, and lets CLI
    overrides win (the reference's ConfigArgs + user-YAML role)."""
    import pytest

    from ktransformers_tpu.serving.config import ServerConfig

    y = tmp_path / "server.yaml"
    y.write_text(
        "port: 9000\nmax_batch_size: 16\noffload: true\n"
        "model_path: /models/x\napi_key: k\n"
    )
    sc = ServerConfig.from_file(str(y))
    assert sc.port == 9000 and sc.max_batch_size == 16 and sc.offload
    assert sc.prefill_chunk == 256  # default preserved
    sc = ServerConfig.from_file(str(y), port=9001)  # CLI override wins
    assert sc.port == 9001

    j = tmp_path / "server.json"
    j.write_text(json.dumps({"page_size": 32, "model_path": "/m"}))
    assert ServerConfig.from_file(str(j)).page_size == 32

    bad = tmp_path / "bad.yaml"
    bad.write_text("prot: 9000\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        ServerConfig.from_file(str(bad))

    scfg = sc.scheduler_config()
    assert scfg.max_batch_size == 16


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
