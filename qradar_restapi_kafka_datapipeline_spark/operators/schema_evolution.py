"""Schema-drift handling (SURVEY §2 B10, §7.2 item 3).

The reference infers schema per-batch from the FIRST row's keys
(``clickhouse/helpers.py:168``) — keys absent from row 0 are silently dropped
and table DDL can diverge across batches.  SURVEY §1.2 flags this as a bug not
to reproduce.  The engine's policy:

- every query/stream pins a canonical schema (``ingest.RAW_EVENT_DDL``);
- drift is an EXPLICIT event: new columns append via parquet ``mergeSchema``
  on read, and :func:`diff_schemas` reports exactly what changed so the
  pipeline can alert instead of silently shape-shifting;
- incompatible type changes are rejected loudly rather than coerced.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass
class SchemaDiff:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    retyped: list[tuple[str, str, str]] = field(default_factory=list)  # (col, old, new)

    @property
    def compatible(self) -> bool:
        """Additive-only drift is accepted; type changes are not."""
        return not self.retyped


def diff_schemas(old: StructType, new: StructType) -> SchemaDiff:
    o = {f.name: f.dataType.simpleString() for f in old.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    return SchemaDiff(
        added=sorted(set(n) - set(o)),
        removed=sorted(set(o) - set(n)),
        retyped=sorted(
            (c, o[c], n[c]) for c in set(o) & set(n) if o[c] != n[c]
        ),
    )


def append_with_evolution(
    spark: SparkSession, df: DataFrame, path: str
) -> SchemaDiff:
    """Append a batch whose schema may have drifted (additive only).

    Raises ``ValueError`` on a column type change — the reference would have
    silently produced divergent DDL here; we refuse.
    Readers use :func:`read_evolved` to see the merged superset schema.
    """
    try:
        current = spark.read.parquet(path).schema
    except Exception:
        df.write.mode("overwrite").parquet(path)
        return SchemaDiff()
    diff = diff_schemas(current, df.schema)
    if not diff.compatible:
        raise ValueError(
            f"incompatible schema drift at {path}: retyped={diff.retyped}"
        )
    df.write.mode("append").parquet(path)
    return diff


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Merged-superset read: files written before a column existed yield NULLs
    for it — the explicit, documented semantics for drift."""
    return spark.read.option("mergeSchema", "true").parquet(path)
