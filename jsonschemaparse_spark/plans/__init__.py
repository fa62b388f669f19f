from .checkpoint import run_json_with_checkpoint, run_with_checkpoint
from .json_validator import validate_json_column, validate_json_rows, validate_json_typed
from .kernels import (
    COMPACT_ARRAY,
    COMPACT_STRUCT,
    ColumnCompiler,
    ExpressionFallback,
    VIOLATION_ARRAY,
    VIOLATION_STRUCT,
)
from .validator import (
    PARTITION_COL,
    VALID_COL,
    VIOLATIONS_COL,
    ValidationResult,
    strict_first_error,
    validate_dataframe,
)

__all__ = [
    "ColumnCompiler",
    "ExpressionFallback",
    "PARTITION_COL",
    "VALID_COL",
    "VIOLATIONS_COL",
    "VIOLATION_ARRAY",
    "VIOLATION_STRUCT",
    "ValidationResult",
    "strict_first_error",
    "run_json_with_checkpoint",
    "run_with_checkpoint",
    "validate_dataframe",
    "validate_json_column",
    "validate_json_rows",
    "validate_json_typed",
]
