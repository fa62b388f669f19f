"""Snapshot-aware table access: Iceberg when available, parquet fallback.

The north rule targets Iceberg tables with snapshot-pinned reads
(referential/drift checks across table@snapshot_a vs @snapshot_b and
checkpoint lineage keyed by snapshot id). The sandbox has no Iceberg
runtime jars, so:

- `read_table` tries the Iceberg source first (format("iceberg") +
  snapshot-id option) and falls back to parquet paths;
- parquet "snapshots" are modeled as subdirectories `<root>/snap=<id>/`,
  which ALSO gives partition pruning on the snapshot key — the same
  pruning Iceberg does via its snapshot manifest.

At production scale swap-in is config-only: the rest of the engine only
sees DataFrames.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(
    spark: SparkSession,
    location: str,
    snapshot_id: Optional[str] = None,
) -> DataFrame:
    """Read a table, optionally pinned to a snapshot.

    Iceberg: `location` is a catalog table name or path; snapshot_id maps
    to the 'snapshot-id' read option (time travel).
    Parquet fallback: `location/snap=<id>` subdir when snapshot_id given,
    plain parquet read otherwise.
    """
    if iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(location)
    if snapshot_id is not None:
        snap_dir = os.path.join(location, f"snap={snapshot_id}")
        if os.path.exists(snap_dir):
            return spark.read.parquet(snap_dir)
        raise FileNotFoundError(f"snapshot dir not found: {snap_dir}")
    return spark.read.parquet(location)


def write_snapshot(df: DataFrame, location: str, snapshot_id: str) -> None:
    """Parquet-fallback snapshot writer (Iceberg writes get snapshots for
    free on commit)."""
    df.write.mode("overwrite").parquet(os.path.join(location, f"snap={snapshot_id}"))
