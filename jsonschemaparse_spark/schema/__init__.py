from .compiler import CompiledSchema, SchemaRegistry, compile_rules
from .evaluate import Evaluator, json_type, validate_instance

__all__ = [
    "CompiledSchema",
    "SchemaRegistry",
    "compile_rules",
    "Evaluator",
    "json_type",
    "validate_instance",
]
