"""Utilities: checkpointing, logging/metrics, profiling hooks."""
