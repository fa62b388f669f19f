from . import (
    decontaminate,
    dedup,
    formats,
    integrity,
    similarity,
    stats,
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
    "stats",
    "stats_math",
    "text",
    "web",
]
