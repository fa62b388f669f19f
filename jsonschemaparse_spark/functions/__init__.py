from . import dedup, integrity, similarity, stats, stats_math, text

__all__ = ["dedup", "integrity", "similarity", "stats", "stats_math", "text"]
