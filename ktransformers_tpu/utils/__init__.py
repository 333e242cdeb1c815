"""Utilities: expert placement, profiling helpers."""
