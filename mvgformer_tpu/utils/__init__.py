"""Utilities: checkpoint conversion, orbax checkpointing, logging."""
