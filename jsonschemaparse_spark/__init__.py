"""jsonschemaparse_spark — a PySpark-native schema + constraint validation
engine with the query/data-processing capabilities of awwright/jsonschemaparse,
re-expressed Spark-first (SURVEY.md).

Public surface (mirrors the reference's index.js exports conceptually):

- ``compile_rules(dict) -> CompiledSchema``    (≈ new Schema, schema.js:227)
- ``validate_instance(rules, value)``          (≈ parseInfo, parse.js:99)
- ``plans.validate_dataframe(df, rules)``      (table-scope single pass)
- ``plans.validate_json_column(df, col, rules)`` (Arrow-batched JSON payload)
- ``functions.*``  stats/sketches, dedup, text analysis, similarity,
  uniqueness/referential/drift table constraints
- ``sources.webpages``  deterministic Common-Crawl-style table synthesis
- ``streaming.*``  Structured-Streaming validation over the same kernels
"""

from .errors import (
    AnnotationRecord,
    ResourceLimitError,
    SchemaError,
    ValidationRecord,
    expected_type,
)
from .schema.compiler import CompiledSchema, SchemaRegistry, compile_rules
from .schema.evaluate import Evaluator, validate_instance

__all__ = [
    "AnnotationRecord",
    "CompiledSchema",
    "Evaluator",
    "ResourceLimitError",
    "SchemaError",
    "SchemaRegistry",
    "ValidationRecord",
    "compile_rules",
    "expected_type",
    "validate_instance",
]

__version__ = "0.1.0"
