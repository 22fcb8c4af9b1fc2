"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``qradar_restapi_kafka_datapipeline_spark`` package; this module just
adapts its query registry (entry_queries.py) to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qradar_restapi_kafka_datapipeline_spark.aql_corpus import (  # noqa: E402
    ALLOWED_INBOUND_TRAFFIC,
    DEFAULT_PARAMS,
)
from qradar_restapi_kafka_datapipeline_spark.entry_queries import (  # noqa: E402
    registry,
    setup,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    AllowedInboundTraffic — the reference's headline AQL (queries.json:2) —
    through the AQL→Spark-SQL frontend.
    """
    frontend = setup(spark, _SMOKE_SF_DIR)
    return frontend.sql(ALLOWED_INBOUND_TRAFFIC, DEFAULT_PARAMS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.run for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted ⇒ rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in registry().items()
        if spec.oracle is not None
    }
