from . import (
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
