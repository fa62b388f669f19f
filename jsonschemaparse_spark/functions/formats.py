"""`format` keyword enforcement — an EXTENSION, off by default.

The reference parses `format` but never enforces it (known-table
schema.js:691, no rule in exportRules; suite format.json passes vacuously).
Parity mode keeps that. With enforce_formats=True the engine applies these
vectorized checks — regexes chosen from the dialect subset that behaves
identically in Java (rlike) and Python (re), so the Column and Arrow paths
agree.
"""

from __future__ import annotations

import re

# pragmatic validators (documented as such; not full RFC grammars)
FORMAT_PATTERNS: dict[str, str] = {
    "date-time": (
        r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$"
    ),
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "time": r"^\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})?$",
    "email": r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$",
    "hostname": r"^(?=.{1,253}$)[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$",
    "ipv4": r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "ipv6": r"^[0-9A-Fa-f:.]{2,45}$",
    "uri": r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "json-pointer": r"^(?:/(?:[^~/]|~0|~1)*)*$",
}

_COMPILED = {name: re.compile(pat) for name, pat in FORMAT_PATTERNS.items()}


def format_ok(name: str, value: str) -> bool:
    """Python-side check (Arrow path). Unknown formats pass (annotation-only,
    draft semantics)."""
    rx = _COMPILED.get(name)
    return True if rx is None else bool(rx.search(value))
