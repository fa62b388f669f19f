from . import (
    chunking,
    decontaminate,
    dedup,
    formats,
    integrity,
    similarity,
    snapshot,
    stats,
    stats_math,
    suggest,
    text,
    web,
)

__all__ = [
    "chunking",
    "decontaminate",
    "dedup",
    "formats",
    "integrity",
    "similarity",
    "snapshot",
    "stats",
    "stats_math",
    "suggest",
    "text",
    "web",
]
