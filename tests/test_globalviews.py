"""Materialized GLOBALVIEW lifecycle: materialize → route → incremental update."""

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.plans.aql import AQLFrontend
from qradar_restapi_kafka_datapipeline_spark.sources.registry import register_qevents
from qradar_restapi_kafka_datapipeline_spark.views import (
    GLOBALVIEW_SPECS,
    materialize_globalviews,
    register_globalviews,
    register_materialized_globalviews,
    update_globalviews_incremental,
)


def test_materialize_route_and_query(spark, sf_dir, tmp_path):
    register_qevents(spark, sf_dir)
    register_globalviews(spark)
    # virtual baseline
    virtual = spark.table("MongoDB_UBA").agg(F.sum("SUM_eventCount")).first()[0]

    base = str(tmp_path / "views")
    materialize_globalviews(spark, base)
    names = register_materialized_globalviews(spark, base)
    assert set(names) == set(GLOBALVIEW_SPECS)

    # the AQL frontend now reads the materialized table
    fe = AQLFrontend(spark)
    df = fe.sql(
        "SELECT * FROM GLOBALVIEW('MongoDB_UBA','NORMAL') "
        "START '2024-01-01 00:00:00' STOP '2025-01-01 00:00:00'"
    )
    assert df.agg(F.sum("SUM_eventCount")).first()[0] == virtual


def test_incremental_update_folds_new_events(spark, sf_dir, tmp_path):
    register_qevents(spark, sf_dir)
    register_globalviews(spark)
    base = str(tmp_path / "views")
    materialize_globalviews(spark, base)
    before = (
        spark.read.parquet(f"{base}/MongoDB_UBA")
        .agg(F.sum("SUM_eventCount")).first()[0]
    )

    # a late 'view' event for an existing hour folds in; others don't touch UBA
    inc = spark.sql(
        "SELECT * FROM qevents WHERE eventName = 'view' LIMIT 3"
    )
    inc_sum = inc.agg(F.sum("eventCount")).first()[0]
    update_globalviews_incremental(spark, base, inc)
    after = (
        spark.read.parquet(f"{base}/MongoDB_UBA")
        .agg(F.sum("SUM_eventCount")).first()[0]
    )
    assert after == before + inc_sum
