"""`kt-tpu` CLI (python -m ktransformers_tpu.cli).

Analog of the reference's `kt` typer app (kt-kernel/python/cli/main.py:
run/chat/model/doctor/config/sft/bench) on click (typer is not in this
environment).
"""
