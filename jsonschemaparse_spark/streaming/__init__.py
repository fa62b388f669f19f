from .validate_stream import foreach_batch_sink, validate_stream, windowed_verdicts

__all__ = ["foreach_batch_sink", "validate_stream", "windowed_verdicts"]
