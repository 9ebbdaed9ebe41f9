"""Pytree path helpers shared by checkpointing, plotting, and partitioning."""

from __future__ import annotations


def path_str(path) -> str:
    """jax key-path -> 'a/b/c' (DictKey.key, SequenceKey.idx, or raw repr)."""
    return "/".join(
        str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
    )
