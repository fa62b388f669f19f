from .validate_stream import (
    foreach_batch_sink,
    streaming_quality_report,
    stateful_validation_monitor,
    validate_json_stream,
    streaming_dedup,
    streaming_exact_dedup,
    validate_stream,
    windowed_verdicts,
)

__all__ = [
    "foreach_batch_sink",
    "streaming_quality_report",
    "stateful_validation_monitor",
    "validate_json_stream",
    "streaming_dedup",
    "streaming_exact_dedup",
    "validate_stream",
    "windowed_verdicts",
]
