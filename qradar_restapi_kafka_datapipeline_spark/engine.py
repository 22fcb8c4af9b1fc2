"""SparkSession factory with scale-oriented defaults.

The reference pipeline hand-tunes its physical execution (2 processes × N query
threads, micro-batches of ``clickhouse_batch_size`` rows — reference ``run.py:34,45``,
``etl.py:41``).  Here all of that is delegated to Spark: AQE re-plans at runtime,
shuffle partitions are sized for the deployment, and Arrow is enabled for any
pandas-UDF edges (vectorized python, never row-at-a-time).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SCRATCH_ROOT: str | None = None

# --- persisted-relation lifecycle (ADVICE r3) --------------------------------
# Operators that persist an intermediate relation (postings, gram positions)
# used to register it under a FIXED global temp-view name and never unpersist:
# repeated invocations in a long-lived session accumulated executor storage
# and clobbered the shared names.  One registry keyed by operator: the next
# invocation releases the previous relation, and every view name gets a
# per-invocation suffix so concurrently-held plans never alias each other.
import itertools as _itertools

_PERSISTED: dict[str, object] = {}
_VIEW_SEQ = _itertools.count()


def unique_view(df, key: str) -> str:
    """Register ``df`` as a temp view under a fresh per-invocation name."""
    name = f"{key}_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(name)
    return name


def persist_tracked(df, key: str):
    """Persist ``df``, releasing the relation the SAME operator persisted
    previously.  Callers that still hold a prior invocation's DataFrame lose
    only its cache (it recomputes), never its correctness."""
    prev = _PERSISTED.pop(key, None)
    if prev is not None:
        prev.unpersist()
    df = df.persist()
    _PERSISTED[key] = df
    return df


def persist_view(df, key: str) -> str:
    """:func:`persist_tracked` + a fresh per-invocation temp-view name.

    CAVEAT (measured, round 4): Spark's CacheManager does NOT substitute a
    cached plan that is referenced through a ``WITH`` CTE — a single
    ``WITH post AS (SELECT ... FROM <this view>)`` consumer re-executes the
    full lineage per reference (0 InMemoryRelation in the optimized plan).
    Use this only for DataFrame-API consumers (joins built on the returned
    relation object); SQL-CTE consumers must use :func:`materialize_view`.
    """
    df = persist_tracked(df, key)
    name = f"{key}_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(name)
    return name


_MATERIALIZED: dict[str, str] = {}


def materialize_view(spark, df, key: str) -> str:
    """Write ``df`` to per-process scratch parquet once and register the
    read-back relation under a fresh temp-view name.

    The compute-once mechanism for relations consumed via SQL ``WITH`` CTEs
    (postings, gram positions): Spark shares no common subplans across CTE
    references AND CacheManager substitution does not reach through CTE
    definitions (see :func:`persist_view`), so caching silently recomputes
    the pipeline per reference — materialized parquet makes every reference
    a cheap columnar scan instead.  This is also the plan that survives
    100 TB: the shared relation exists once on storage, and each consumer
    stage scans it with pruning instead of re-deriving it.  Re-invocation
    under the same ``key`` removes the previous artifact (bounded scratch).
    """
    prev = _MATERIALIZED.pop(key, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    path = scratch_dir(f"mat_{key.strip('_')}_")
    df.write.mode("overwrite").parquet(path)
    _MATERIALIZED[key] = path
    name = f"{key}_{next(_VIEW_SEQ)}"
    spark.read.parquet(path).createOrReplaceTempView(name)
    return name


def scratch_dir(prefix: str) -> str:
    """Per-process scratch directory, removed at interpreter exit.

    Replaces bare ``tempfile.mkdtemp`` in query/streaming paths: those dirs
    were never cleaned, so repeated gate runs accumulated /tmp disk (ADVICE
    r2).  Every caller gets a unique subdir (concurrent gate/pytest runs
    cannot collide), and ONE atexit hook reclaims the whole per-process tree
    after the gate has consumed the results — lazy DataFrames returned to the
    driver are always materialized within the owning process's lifetime.
    """
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)

# Defaults chosen for the local[32] test harness; on a real cluster these are
# overridden by spark-submit conf.  AQE handles skew + post-shuffle coalescing so a
# too-large static shuffle-partition count is self-correcting.
_DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB scan splits: at 100 TB that is ~800k tasks — fine for a 1000-executor
    # cluster; raise to 256-512 MB for colder storage.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Small dimension tables (domain/qid/category/network decodes) must broadcast.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.session.timeZone": "UTC",
    # The reference's event keys are case-sensitive Python dict keys (userName
    # vs username are DISTINCT inputs that collide only via the rename map,
    # clickhouse/helpers.py:31-32); match that.
    "spark.sql.caseSensitive": "true",
    # Some testdata generations carry TIMESTAMP(NANOS) in events.parquet;
    # Spark has no ns timestamp, so read those as int64 nanos and cast in the
    # registry (µs, floor — same truncation DuckDB applies). A no-op for
    # µs-precision files (the registry branches on the type it actually sees).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "qradar-datapipeline-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for the test harness; on a
    cluster, leave it unset and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _quiet_codegen_fallback(spark)
    return spark


def _quiet_codegen_fallback(spark: SparkSession) -> None:
    """Drop the janino stack trace spam when an oversized expression falls back
    to interpreted mode — the fallback is intended behavior for view-expanded
    predicates (the materialized path stays in codegen); the ERROR-level trace
    is pure noise."""
    try:
        jvm = spark.sparkContext._jvm
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        level = jvm.org.apache.logging.log4j.Level.OFF
        configurator.setLevel(
            "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator", level
        )
    except Exception:
        pass  # non-log4j2 deployments just keep the default logging
