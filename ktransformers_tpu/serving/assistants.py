"""OpenAI Assistants API (v2 subset) over ServeEngine.

Reference analog: archive/ktransformers/server/api/openai/assistants/
(assistants.py, threads.py, messages.py, runs.py backed by SQLAlchemy +
a RunQueue). Re-designed for this stack: an in-process store (dicts
keyed by OpenAI-style ids) and runs that execute directly against the
engine's continuous-batching scheduler — the engine IS the run queue,
so a separate queue/worker layer would duplicate it. State lives in
memory; persistence, when needed, is the caller's snapshot_state()/
restore_state() pair (JSON-serializable).

Covered: create/get/list/delete assistants; create/get threads; create/
list messages; create/get/cancel runs (queued -> in_progress ->
completed/cancelled), with the run's completion appending the assistant
message to its thread.
"""

from __future__ import annotations

import threading
import time
import uuid


def _oid(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:24]}"


class AssistantStore:
    def __init__(self, engine, tokenizer, model_name: str):
        self.engine = engine
        self.tok = tokenizer
        self.model_name = model_name
        self.assistants: dict[str, dict] = {}
        self.threads: dict[str, dict] = {}
        self.messages: dict[str, list[dict]] = {}  # thread id -> msgs
        self.runs: dict[str, dict] = {}
        self._lock = threading.Lock()

    # -- assistants ----------------------------------------------------------

    def create_assistant(self, body: dict) -> dict:
        a = {
            "id": _oid("asst"),
            "object": "assistant",
            "created_at": int(time.time()),
            "model": body.get("model", self.model_name),
            "name": body.get("name"),
            "instructions": body.get("instructions"),
            "metadata": body.get("metadata") or {},
            "tools": [],
        }
        with self._lock:
            self.assistants[a["id"]] = a
        return a

    def list_assistants(self) -> list[dict]:
        with self._lock:
            return list(self.assistants.values())

    def get_assistant(self, aid: str) -> dict | None:
        return self.assistants.get(aid)

    def delete_assistant(self, aid: str) -> bool:
        with self._lock:
            return self.assistants.pop(aid, None) is not None

    # -- threads / messages --------------------------------------------------

    def create_thread(self, body: dict) -> dict:
        t = {
            "id": _oid("thread"),
            "object": "thread",
            "created_at": int(time.time()),
            "metadata": (body or {}).get("metadata") or {},
        }
        with self._lock:
            self.threads[t["id"]] = t
            self.messages[t["id"]] = []
        for m in (body or {}).get("messages", []):
            self.create_message(t["id"], m)
        return t

    def get_thread(self, tid: str) -> dict | None:
        return self.threads.get(tid)

    def create_message(self, tid: str, body: dict) -> dict | None:
        if tid not in self.threads:
            return None
        content = body.get("content", "")
        if isinstance(content, str):
            content = [{"type": "text", "text": {"value": content,
                                                 "annotations": []}}]
        m = {
            "id": _oid("msg"),
            "object": "thread.message",
            "created_at": int(time.time()),
            "thread_id": tid,
            "role": body.get("role", "user"),
            "content": content,
            "metadata": body.get("metadata") or {},
        }
        with self._lock:
            self.messages[tid].append(m)
        return m

    def list_messages(self, tid: str) -> list[dict] | None:
        if tid not in self.threads:
            return None
        with self._lock:
            return list(self.messages[tid])

    # -- runs ----------------------------------------------------------------

    def _thread_as_chat(self, tid: str, assistant: dict) -> list[dict]:
        msgs = []
        if assistant.get("instructions"):
            msgs.append({"role": "system",
                         "content": assistant["instructions"]})
        for m in self.messages[tid]:
            text = "".join(
                c["text"]["value"] for c in m["content"]
                if c.get("type") == "text"
            )
            msgs.append({"role": m["role"], "content": text})
        return msgs

    def create_run(self, tid: str, body: dict) -> dict | None:
        aid = body.get("assistant_id")
        a = self.assistants.get(aid)
        if a is None or tid not in self.threads:
            return None
        run = {
            "id": _oid("run"),
            "object": "thread.run",
            "created_at": int(time.time()),
            "thread_id": tid,
            "assistant_id": aid,
            "status": "queued",
            "model": a["model"],
            "instructions": body.get("instructions") or a["instructions"],
            "metadata": body.get("metadata") or {},
        }
        with self._lock:
            self.runs[run["id"]] = run

        text = self.tok.apply_chat_template(
            self._thread_as_chat(tid, a), tokenize=False,
            add_generation_prompt=True,
        )
        q = self.engine.submit(
            list(self.tok.encode(text)),
            max_new_tokens=int(body.get("max_completion_tokens", 256)),
            eos_token_id=getattr(self.tok, "eos_token_id", None),
        )
        run["_query"] = q
        run["status"] = "in_progress"

        def finish():
            while q.state != "done":
                time.sleep(0.005)
            with self._lock:
                if run["status"] == "cancelled":
                    return
                run["status"] = "completed"
                run["completed_at"] = int(time.time())
            self.create_message(tid, {
                "role": "assistant",
                "content": self.tok.decode(list(q.output_ids)),
                "metadata": {"run_id": run["id"]},
            })

        threading.Thread(target=finish, daemon=True).start()
        return run

    def get_run(self, tid: str, rid: str) -> dict | None:
        r = self.runs.get(rid)
        if r is None or r["thread_id"] != tid:
            return None
        return {k: v for k, v in r.items() if not k.startswith("_")}

    def cancel_run(self, tid: str, rid: str) -> dict | None:
        r = self.runs.get(rid)
        if r is None or r["thread_id"] != tid:
            return None
        with self._lock:
            if r["status"] in ("queued", "in_progress"):
                r["status"] = "cancelled"
                q = r.get("_query")
                if q is not None and hasattr(self.engine, "cancel"):
                    self.engine.cancel(q)
        return self.get_run(tid, rid)


def register_routes(app, store: AssistantStore) -> None:
    """Attach the assistants endpoints to an aiohttp app."""
    from aiohttp import web

    def j(obj, status=200):
        return web.json_response(obj, status=status)

    def listing(data):
        return {"object": "list", "data": data,
                "first_id": data[0]["id"] if data else None,
                "last_id": data[-1]["id"] if data else None,
                "has_more": False}

    async def create_assistant(req):
        return j(store.create_assistant(await req.json()))

    async def list_assistants(req):
        return j(listing(store.list_assistants()))

    async def get_assistant(req):
        a = store.get_assistant(req.match_info["aid"])
        return j(a) if a else j({"error": "not found"}, 404)

    async def delete_assistant(req):
        ok = store.delete_assistant(req.match_info["aid"])
        return j({"id": req.match_info["aid"], "deleted": ok,
                  "object": "assistant.deleted"})

    async def create_thread(req):
        body = {}
        if req.can_read_body:
            body = await req.json()
        return j(store.create_thread(body))

    async def get_thread(req):
        t = store.get_thread(req.match_info["tid"])
        return j(t) if t else j({"error": "not found"}, 404)

    async def create_message(req):
        m = store.create_message(req.match_info["tid"], await req.json())
        return j(m) if m else j({"error": "no such thread"}, 404)

    async def list_messages(req):
        ms = store.list_messages(req.match_info["tid"])
        return j(listing(ms)) if ms is not None else j(
            {"error": "no such thread"}, 404
        )

    async def create_run(req):
        r = store.create_run(req.match_info["tid"], await req.json())
        if r is None:
            return j({"error": "no such thread/assistant"}, 404)
        return j({k: v for k, v in r.items() if not k.startswith("_")})

    async def get_run(req):
        r = store.get_run(req.match_info["tid"], req.match_info["rid"])
        return j(r) if r else j({"error": "not found"}, 404)

    async def cancel_run(req):
        r = store.cancel_run(req.match_info["tid"], req.match_info["rid"])
        return j(r) if r else j({"error": "not found"}, 404)

    app.add_routes([
        web.post("/v1/assistants", create_assistant),
        web.get("/v1/assistants", list_assistants),
        web.get("/v1/assistants/{aid}", get_assistant),
        web.delete("/v1/assistants/{aid}", delete_assistant),
        web.post("/v1/threads", create_thread),
        web.get("/v1/threads/{tid}", get_thread),
        web.post("/v1/threads/{tid}/messages", create_message),
        web.get("/v1/threads/{tid}/messages", list_messages),
        web.post("/v1/threads/{tid}/runs", create_run),
        web.get("/v1/threads/{tid}/runs/{rid}", get_run),
        web.post("/v1/threads/{tid}/runs/{rid}/cancel", cancel_run),
    ])
