"""Serving engine: continuous batching + paged KV + OpenAI-compatible API.

TPU re-design of the reference's balance_serve stack
(archive/csrc/balance_serve/sched/scheduler.cpp event-loop + FCFS chunked
prefill, archive/ktransformers/server/backend/interfaces/balance_serve.py
Engine.loop, server/main.py FastAPI app): the C++ scheduler becomes a
Python host-side scheduler feeding fixed-shape jitted steps (the CUDA-graph
bucket analog), ZMQ RPC disappears (same process), and FastAPI becomes
aiohttp (fastapi is not available in this environment).
"""

from ktransformers_tpu.serving.scheduler import Query, Scheduler, SchedulerConfig
from ktransformers_tpu.serving.engine import ServeEngine

__all__ = ["Query", "Scheduler", "SchedulerConfig", "ServeEngine"]
