from . import dedup, formats, integrity, similarity, stats, stats_math, text, web

__all__ = ["dedup", "formats", "integrity", "similarity", "stats", "stats_math", "text", "web"]
