from . import (
    decontaminate,
    dedup,
    formats,
    integrity,
    similarity,
    snapshot,
    stats,
    suggest,
    stats_math,
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
    "text",
    "web",
]
