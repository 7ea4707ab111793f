"""Visualization, diagnostics, checkpointing, and profiling utilities."""
