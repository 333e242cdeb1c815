"""OpenAI-compatible HTTP server (aiohttp) over ServeEngine.

Analog of the reference's FastAPI app (archive/ktransformers/server/main.py
create_app + server/api/: /v1/chat/completions, /v1/completions, /v1/models,
Ollama-style endpoints) — on aiohttp because fastapi/uvicorn are not in this
environment. Streaming uses SSE chunks in the OpenAI format; /metrics
exposes Prometheus text (reference: sched/metrics.h exposer).
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid

from aiohttp import web

from ktransformers_tpu.engine.sampler import SamplingConfig
from ktransformers_tpu.serving.engine import ServeEngine


class SimpleTokenizer:
    """Whitespace/codepoint fallback tokenizer for tests and raw-id mode."""

    eos_token_id = None

    def encode(self, text: str):
        return [ord(c) % 50000 for c in text]

    def decode(self, ids):
        return "".join(chr((i % 94) + 33) for i in ids)

    def apply_chat_template(self, messages, **kw):
        return "\n".join(f"{m['role']}: {m['content']}" for m in messages)


def _sse(data) -> bytes:
    return f"data: {json.dumps(data)}\n\n".encode()


class OpenAIServer:
    def __init__(self, engine: ServeEngine, tokenizer=None,
                 model_name="ktransformers-tpu", api_key: str | None = None,
                 mount_web: bool = True):
        self.engine = engine
        self.tok = tokenizer or SimpleTokenizer()
        self.model_name = model_name
        self.api_key = api_key
        middlewares = [self._auth_middleware] if api_key else []
        self.app = web.Application(middlewares=middlewares)
        from ktransformers_tpu.serving.assistants import (
            AssistantStore,
            register_routes,
        )

        self.assistants = AssistantStore(engine, self.tok, model_name)
        register_routes(self.app, self.assistants)
        if mount_web:
            self.app.add_routes(
                [web.get("/", self.webui), web.get("/web", self.webui)]
            )
        self.app.add_routes(
            [
                web.get("/health", self.health),
                web.get("/v1/models", self.models),
                web.get("/metrics", self.metrics),
                web.post("/v1/completions", self.completions),
                web.post("/v1/chat/completions", self.chat_completions),
                web.get("/api/tags", self.ollama_tags),
                web.post("/api/generate", self.ollama_generate),
                web.post("/api/chat", self.ollama_chat),
            ]
        )

    # -- helpers -----------------------------------------------------------

    @web.middleware
    async def _auth_middleware(self, request, handler):
        """Bearer-token auth on the API surface (reference --api_key).
        Health, metrics, and the chat page stay open."""
        if request.path.startswith("/v1") or request.path.startswith("/api"):
            auth = request.headers.get("Authorization", "")
            if auth != f"Bearer {self.api_key}":
                return web.json_response(
                    {"error": {"message": "invalid api key",
                               "type": "authentication_error"}},
                    status=401,
                )
        return await handler(request)

    def _prompt_ids(self, body: dict) -> list[int]:
        if "messages" in body:
            messages = body["messages"]
            if body.get("tools"):
                # OpenAI tool calling (serving/tools.py; reference:
                # function_call_test.py protocol): inject the tool
                # schemas as a system preamble and flatten tool-role /
                # tool_calls turns for the template
                from ktransformers_tpu.serving.tools import (
                    render_tool_messages,
                    render_tools_preamble,
                )

                pre = render_tools_preamble(
                    body["tools"], body.get("tool_choice", "auto")
                )
                messages = [{"role": "system", "content": pre}] + (
                    render_tool_messages(messages)
                )
            text = self.tok.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True
            )
            ids = self.tok.encode(text)
        else:
            prompt = body.get("prompt", "")
            if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
                return prompt
            ids = self.tok.encode(prompt)
        return list(ids)

    def _sampling(self, body: dict) -> SamplingConfig:
        return SamplingConfig(
            temperature=float(body.get("temperature", 0.0) or 0.0),
            top_p=float(body.get("top_p", 1.0) or 1.0),
            top_k=int(body.get("top_k", 0) or 0),
            repetition_penalty=float(body.get("repetition_penalty", 1.0) or 1.0),
            presence_penalty=float(body.get("presence_penalty", 0.0) or 0.0),
            frequency_penalty=float(body.get("frequency_penalty", 0.0) or 0.0),
        )

    async def _collect(self, q) -> list[int]:
        loop = asyncio.get_running_loop()
        out = []
        while True:
            tok = await loop.run_in_executor(None, q.out_queue.get)
            if tok is None:
                return out
            out.append(tok)

    # -- endpoints ---------------------------------------------------------

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def webui(self, request):
        """Built-in chat UI (reference: archive/website Vue app; here one
        dependency-free HTML file, see serving/webui/index.html)."""
        import os

        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "webui", "index.html"
        )
        with open(path, "rb") as f:
            return web.Response(body=f.read(), content_type="text/html")

    async def models(self, request):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": self.model_name,
                        "object": "model",
                        "owned_by": "ktransformers_tpu",
                    }
                ],
            }
        )

    async def metrics(self, request):
        lines = []
        for k, v in self.engine.metrics().items():
            lines.append(f"# TYPE ktransformers_tpu_{k} gauge")
            lines.append(f"ktransformers_tpu_{k} {float(v)}")
        return web.Response(text="\n".join(lines) + "\n")

    async def completions(self, request):
        return await self._serve(request, chat=False)

    # -- Ollama-compatible endpoints (reference: server/api/ollama) --------

    async def ollama_tags(self, request):
        return web.json_response(
            {"models": [{"name": self.model_name, "model": self.model_name}]}
        )

    async def ollama_generate(self, request):
        body = await request.json()
        ids = self.tok.encode(body.get("prompt", ""))
        q = self.engine.submit(
            list(ids),
            max_new_tokens=int(body.get("options", {}).get("num_predict", 128)),
            sampling=self._sampling(body.get("options", {})),
            eos_token_id=getattr(self.tok, "eos_token_id", None),
        )
        out = await self._collect(q)
        return web.json_response(
            {
                "model": self.model_name,
                "response": self.tok.decode(out),
                "done": True,
                "done_reason": q.finish_reason or "stop",
                "eval_count": len(out),
            }
        )

    async def ollama_chat(self, request):
        body = await request.json()
        text = self.tok.apply_chat_template(
            body.get("messages", []), tokenize=False,
            add_generation_prompt=True,
        )
        ids = self.tok.encode(text)
        q = self.engine.submit(
            list(ids),
            max_new_tokens=int(body.get("options", {}).get("num_predict", 128)),
            sampling=self._sampling(body.get("options", {})),
            eos_token_id=getattr(self.tok, "eos_token_id", None),
        )
        out = await self._collect(q)
        return web.json_response(
            {
                "model": self.model_name,
                "message": {"role": "assistant", "content": self.tok.decode(out)},
                "done": True,
                "done_reason": q.finish_reason or "stop",
            }
        )

    async def chat_completions(self, request):
        return await self._serve(request, chat=True)

    async def _serve(self, request, chat: bool):
        body = await request.json()
        ids = self._prompt_ids(body)
        max_new = int(
            body.get("max_tokens", body.get("max_completion_tokens", 128)) or 128
        )
        q = self.engine.submit(
            ids,
            max_new_tokens=max_new,
            sampling=self._sampling(body),
            eos_token_id=getattr(self.tok, "eos_token_id", None),
        )
        rid = f"{'chatcmpl' if chat else 'cmpl'}-{uuid.uuid4().hex[:12]}"
        created = int(time.time())

        if body.get("stream") and chat and body.get("tools") \
                and body.get("tool_choice") != "none":
            # tool-call streaming: collect, parse, emit ONE delta chunk
            # (OpenAI-compatible enough for function_call_test-style
            # clients; token-level tool-call deltas are a follow-up)
            out = await self._collect(q)
            text = self.tok.decode(out)
            from ktransformers_tpu.serving.tools import parse_tool_calls

            content, calls = parse_tool_calls(text)
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                }
            )
            await resp.prepare(request)
            delta = {"role": "assistant"}
            finish = q.finish_reason or "stop"
            if calls:
                for i, c in enumerate(calls):
                    c["index"] = i
                delta["tool_calls"] = calls
                if content:
                    delta["content"] = content
                finish = "tool_calls"
            else:
                delta["content"] = text
            await resp.write(_sse({
                "id": rid, "object": "chat.completion.chunk",
                "created": created, "model": self.model_name,
                "choices": [
                    {"index": 0, "delta": delta, "finish_reason": None}
                ],
            }))
            await resp.write(_sse({
                "id": rid, "object": "chat.completion.chunk",
                "created": created, "model": self.model_name,
                "choices": [
                    {"index": 0, "delta": {}, "finish_reason": finish}
                ],
            }))
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        if body.get("stream"):
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                }
            )
            await resp.prepare(request)
            loop = asyncio.get_running_loop()
            while True:
                tok = await loop.run_in_executor(None, q.out_queue.get)
                if tok is None:
                    break
                if request.transport is None or request.transport.is_closing():
                    # client went away mid-stream: free the query's slot
                    # and pages instead of decoding to max_tokens
                    self.engine.cancel(q)
                    return resp
                delta_text = self.tok.decode([tok])
                if chat:
                    chunk = {
                        "id": rid,
                        "object": "chat.completion.chunk",
                        "created": created,
                        "model": self.model_name,
                        "choices": [
                            {
                                "index": 0,
                                "delta": {"content": delta_text},
                                "finish_reason": None,
                            }
                        ],
                    }
                else:
                    chunk = {
                        "id": rid,
                        "object": "text_completion",
                        "created": created,
                        "model": self.model_name,
                        "choices": [
                            {"index": 0, "text": delta_text, "finish_reason": None}
                        ],
                    }
                await resp.write(_sse(chunk))
            final = {
                "id": rid,
                "object": "chat.completion.chunk" if chat else "text_completion",
                "created": created,
                "model": self.model_name,
                "choices": [
                    {
                        "index": 0,
                        "delta" if chat else "text": {} if chat else "",
                        "finish_reason": q.finish_reason or "stop",
                    }
                ],
            }
            await resp.write(_sse(final))
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        out = await self._collect(q)
        text = self.tok.decode(out)
        usage = {
            "prompt_tokens": len(ids),
            "completion_tokens": len(out),
            "total_tokens": len(ids) + len(out),
        }
        if chat:
            message = {"role": "assistant", "content": text}
            finish = q.finish_reason or "stop"
            if body.get("tools") and body.get("tool_choice") != "none":
                from ktransformers_tpu.serving.tools import parse_tool_calls

                content, calls = parse_tool_calls(text)
                if calls:
                    message = {
                        "role": "assistant",
                        "content": content or None,
                        "tool_calls": calls,
                    }
                    finish = "tool_calls"
            payload = {
                "id": rid,
                "object": "chat.completion",
                "created": created,
                "model": self.model_name,
                "choices": [
                    {
                        "index": 0,
                        "message": message,
                        "finish_reason": finish,
                    }
                ],
                "usage": usage,
            }
        else:
            payload = {
                "id": rid,
                "object": "text_completion",
                "created": created,
                "model": self.model_name,
                "choices": [
                    {
                        "index": 0,
                        "text": text,
                        "finish_reason": q.finish_reason or "stop",
                    }
                ],
                "usage": usage,
            }
        return web.json_response(payload)


def serve(engine: ServeEngine, tokenizer=None, host="0.0.0.0", port=8192,
          model_name="ktransformers-tpu", api_key=None, mount_web=True):
    """Blocking entry: start the engine thread + HTTP server."""
    engine.start()
    srv = OpenAIServer(engine, tokenizer, model_name=model_name,
                       api_key=api_key, mount_web=mount_web)
    web.run_app(srv.app, host=host, port=port)
