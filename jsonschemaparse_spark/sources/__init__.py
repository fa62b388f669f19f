from .webpages import (
    LANGS,
    charset_violations,
    extract_text,
    synthesize_webpages,
)

__all__ = ["LANGS", "charset_violations", "extract_text", "synthesize_webpages"]
