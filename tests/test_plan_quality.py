"""Plan-quality regression tests: pushdown, pruning, broadcast (SURVEY §4).

These lock in the physical-plan properties the engine depends on at 100 TB —
a regression that silently drops a pushed filter or flips a broadcast join to
sort-merge should fail CI, not show up in a fleet bill.
"""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def reg(spark, sf_dir):
    from qradar_restapi_kafka_datapipeline_spark.entry_queries import registry, setup

    setup(spark, sf_dir)
    return registry()


def test_filter_pushdown_reaches_parquet(spark, reg, sf_dir):
    plan = _formatted_plan(reg["pricing_summary"].run(spark, sf_dir))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no PushedFilters in scan"
    assert "l_shipdate" in m.group(1), m.group(1)


def test_column_pruning_reaches_parquet(spark, reg, sf_dir):
    plan = _formatted_plan(reg["pricing_summary"].run(spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "l_orderkey" not in read_cols and "l_partkey" not in read_cols


def test_view_derivation_prunes_to_used_columns(spark, reg, sf_dir):
    # the whole INCIDR classification derives from event_id arithmetic; the
    # events scan must read exactly that one column
    plan = _formatted_plan(reg["incidr_classification"].run(spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1) == "event_id:bigint", m.group(1)


def test_dim_joins_broadcast(spark, reg, sf_dir):
    plan = _formatted_plan(reg["revenue_by_nation"].run(spark, sf_dir))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" in plan


def test_decode_join_broadcasts(spark, sf_dir):
    from qradar_restapi_kafka_datapipeline_spark.functions.decode import build_dims, decode_join

    events = spark.range(1000).select((F.col("id") % 5).alias("domainId"))
    out = decode_join(events, build_dims(spark)["dim_domain"], "domainId",
                      "domainId", "domainName", "name")
    plan = _formatted_plan(out)
    assert "BroadcastHashJoin" in plan


def test_rollup_partial_aggregation(spark, reg, sf_dir):
    # map-side partial aggregate before the shuffle: two HashAggregate nodes
    plan = _formatted_plan(reg["summing_rollup_hourly"].run(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_minhash_pipeline_exchange_budget(spark, reg, sf_dir):
    # The LSH pipeline's shuffle budget: shingle spread + signature agg +
    # candidate distinct + verify common-agg (+AQE reuse). A regression that
    # reintroduces per-use aggregation passes over the shingle relation
    # (e.g. recomputing per-doc counts) pushes this past the budget.
    plan = _formatted_plan(reg["dedup_minhash_lsh"].run(spark, sf_dir))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 6, f"{n_exchanges} exchanges in minhash plan"


def test_minhash_counts_ride_signature_aggregate(spark, sf_dir):
    # |shingles(doc)| must come out of the SAME aggregate as the minhash
    # signatures — a separate count aggregation doubles full passes over the
    # shingle relation at 100 TB.
    from qradar_restapi_kafka_datapipeline_spark.operators import dedup as D

    df = D.minhash_lsh_pairs(spark.table("documents"), threshold=0.85)
    plan = _formatted_plan(df)
    sig_aggs = re.findall(r"Functions(?:.*?min.*?){8,}", plan)
    assert sig_aggs, "no wide min-aggregate (minhash signatures) in plan"


def test_rollup_sink_day_partition_pruning(spark, sf_dir, tmp_path):
    # The day-partitioned roll-up layout exists so START/STOP time bounds
    # prune at the file-listing level (ClickHouse PARTITION BY toYYYYMMDD
    # parity). A date predicate must land in PartitionFilters — not a
    # post-scan Filter — or at 100 TB every day's files get listed and read.
    from qradar_restapi_kafka_datapipeline_spark.entry_queries import setup
    from qradar_restapi_kafka_datapipeline_spark.operators.rollup import write_rollup

    setup(spark, sf_dir)
    src = spark.sql(
        "SELECT ts AS Start_Time, domainId, eventName, eventCount AS Event_Count "
        "FROM qevents"
    )
    path = str(tmp_path / "rollup")
    write_rollup(src, path, mode="overwrite")

    bounded = spark.read.parquet(path).where(
        "event_date >= DATE'2024-01-02' AND event_date < DATE'2024-01-04'"
    )
    plan = _formatted_plan(bounded)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan[:800]
    # and the pruned scan must touch only the two bounded days
    n_days = spark.read.parquet(path).selectExpr(
        "count(distinct event_date)"
    ).first()[0]
    assert n_days > 2  # the table spans more days than the bound
    touched = bounded.select("event_date").distinct().count()
    assert touched == 2


def test_contamination_join_is_equi_not_cross(spark, reg, sf_dir):
    # the test-vs-train shingle overlap must be a shuffle/broadcast EQUI-join
    # keyed on the shingle — a nested-loop or cartesian shape here is O(n^2)
    # in corpus size and would never survive 100 TB
    plan = _formatted_plan(reg["contamination_check"].run(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan, "train-overlap should be a left-semi join"


def test_prefix_dedup_single_narrow_shuffle(spark, reg, sf_dir):
    # one groupBy on the 16-byte fingerprint; the scan reads only (doc_id,
    # text) and the text itself never crosses the wire (fingerprint does)
    plan = _formatted_plan(reg["dedup_prefix"].run(spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"doc_id", "text"}, read_cols
    assert plan.count("HashAggregate") >= 2  # map-side partial before shuffle


def test_correlated_subquery_decorrelates(spark, reg, sf_dir):
    # the per-part AVG threshold must become an aggregate + join, not a
    # re-executed per-row subquery (quadratic at scale)
    plan = _formatted_plan(reg["small_quantity_revenue"].run(spark, sf_dir))
    assert "Subquery" not in plan, "scalar subquery not decorrelated"
    assert "CartesianProduct" not in plan


def test_headline_codegen_at_runtime(spark, reg, sf_dir):
    # AQE pre-execution plans carry no codegen annotation; after execution the
    # final plan must show WholeStageCodegen spans — the scan-to-aggregate
    # pipeline runs as generated JVM code, not interpreted expressions
    df = reg["pricing_summary"].run(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages print as "*(N) Operator" in the executed-plan string
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan[:600]


def test_pii_redaction_stays_jvm_side(spark, reg, sf_dir):
    # the redaction chain is nested regexp_replace — codegen'd expressions,
    # no Python evaluation nodes, and only the aggregate's exchange
    plan = _formatted_plan(reg["pii_redaction_report"].run(spark, sf_dir))
    assert "EvalPython" not in plan, "PII redaction fell into a Python UDF"
    assert plan.count("Exchange") <= 2, plan[:800]


def test_boilerplate_coverage_broadcasts_lexicon(spark, reg, sf_dir):
    # the repeated-fragment lexicon is tiny — it must broadcast into the
    # per-position coverage join, never sort-merge or cross-join
    plan = _formatted_plan(reg["boilerplate_doc_coverage"].run(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "CartesianProduct" not in plan


def test_semantic_dedup_join_path_shape(spark, reg, sf_dir):
    # many-cell mode: centroid assignment is a deliberate broadcast
    # nested-loop (tiny centroid table); the candidate pair join must be an
    # equi-join on list_id — no cross product anywhere
    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    df = semantic_dedup_pairs(
        spark.table("embeddings"), threshold=0.42, n_centroids=128,
        sample_n=256,
    )
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    # formatted plans list join keys in the detail section ("Left keys: ...")
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert re.search(r"keys(?: \[\d+\])?: \[list_id", plan), plan[:1200]


def test_day_partitioned_aql_scan_prunes(spark, reg, sf_dir):
    """The A13 scan-economics proof (VERDICT r2 #7), static half: a
    START/STOP AQL run through the frontend over day-partitioned events must
    carry constant event_date PartitionFilters.  The dynamic half (the
    pruned scan never OPENS out-of-range files) is the corrupt-file-canary
    test below."""
    df = reg["aql_day_pruned_scan"].run(spark, sf_dir)
    plan = _formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "no PartitionFilters on the day-partitioned scan"
    assert "event_date" in m.group(1), m.group(1)
    assert re.search(r"event_date#\d+ >= 19", m.group(1)) or "2024" in m.group(1), (
        "no constant lower bound in PartitionFilters: " + m.group(1)
    )


def test_day_partitioned_scan_never_opens_pruned_files(spark, tmp_path, sf_dir):
    """DYNAMIC pruning proof via a corrupt-file canary (review r3: the prior
    'dynamic' check only counted distinct dates, which any post-scan filter
    satisfies).  A parquet file in a partition OUTSIDE the START/STOP range
    is overwritten with garbage: the partition-pruned frontend query must
    succeed (the file is never opened), while the same query WITHOUT the
    derived partition predicate must fail trying to read it — proving the
    canary bites and pruning is file-level, not row-level."""
    import glob
    import os

    from qradar_restapi_kafka_datapipeline_spark.entry_queries import setup
    from qradar_restapi_kafka_datapipeline_spark.plans.aql import AQLFrontend
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import (
        materialize_events_day_partitioned,
    )

    setup(spark, sf_dir)
    base = str(tmp_path / "qevents_day_canary")
    materialize_events_day_partitioned(spark, base)
    # capture the schema while every file is healthy (inference may touch any
    # file), then poison a partition outside the 2024-01-06..08 query range
    healthy = spark.read.option("basePath", base).parquet(base)
    schema = healthy.schema
    out_of_range = sorted(
        d for d in glob.glob(f"{base}/event_date=*")
        if "2024-01-15" in d or "2024-01-16" in d
    )
    assert out_of_range, "expected out-of-range partitions in the testdata"
    victim = glob.glob(f"{out_of_range[0]}/*.parquet")[0]
    with open(victim, "wb") as f:
        f.write(b"not a parquet file")
    for crc in glob.glob(f"{out_of_range[0]}/.*.crc"):
        os.remove(crc)
    spark.read.schema(schema).option("basePath", base).parquet(
        base
    ).createOrReplaceTempView("qevents_day_canary")
    aql = (
        "SELECT eventName, CAST(SUM(eventCount) AS BIGINT) AS total "
        "FROM events GROUP BY eventName "
        "START '2024-01-06 00:00:00' STOP '2024-01-09 00:00:00'"
    )
    pruned_fe = AQLFrontend(
        spark, events_view="qevents_day_canary", partition_col="event_date"
    )
    rows = pruned_fe.sql(aql).collect()  # must not touch the poisoned file
    assert rows
    # control: same query with only the ts predicate reads every file and
    # must hit the canary — proving the pruned path really skipped it
    plain_fe = AQLFrontend(spark, events_view="qevents_day_canary")
    with pytest.raises(Exception):
        plain_fe.sql(aql).collect()


def test_ivf_index_scan_prunes_to_probed_lists(spark, reg, sf_dir):
    """The persisted-IVF serving contract: the assignments scan must carry a
    list_id PartitionFilter (the probed lists as a static IN), so per-query
    scan cost is bounded by nprobe partitions regardless of index size."""
    from qradar_restapi_kafka_datapipeline_spark.entry_queries import (
        _IVF_INDEX_MEMO,
    )
    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        knn_ivf_from_index,
    )

    reg["knn_ivf_persisted"].run(spark, sf_dir)  # builds + memoizes the index
    df = knn_ivf_from_index(
        spark,
        _IVF_INDEX_MEMO[(id(spark), sf_dir)],
        spark.table("embeddings").where("vec_id < 10"),
        k=3,
    )
    plan = _formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "no PartitionFilters on the assignments scan"
    assert "list_id" in m.group(1), m.group(1)
    # static probed-set pruning renders as INSET (Catalyst may add a
    # dynamicpruningexpression on top — both are file-level pruning)
    assert "INSET" in m.group(1) or "IN (" in m.group(1), m.group(1)


def test_ivfpq_codes_scan_prunes_and_reads_no_vectors(spark, reg, sf_dir):
    """The IVF-PQ serving contract (round 5): the codes scan must carry a
    list_id PartitionFilter (file-pruned to the probed lists) AND must not
    read an embedding column anywhere — the whole point of PQ is that the
    serve path touches codes, the LUT, and nothing vector-shaped."""
    from qradar_restapi_kafka_datapipeline_spark.entry_queries import (
        _IVFPQ_MEMO,
    )
    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        knn_ivfpq_from_index,
    )

    reg["knn_ivfpq_persisted"].run(spark, sf_dir)  # builds + memoizes
    df = knn_ivfpq_from_index(
        spark, _IVFPQ_MEMO[(id(spark), sf_dir)], dim=64
    )
    plan = _formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "no PartitionFilters on the codes scan"
    assert "list_id" in m.group(1), m.group(1)
    assert "INSET" in m.group(1) or "IN (" in m.group(1), m.group(1)
    # the codes scan itself is embedding-free; the only embedding read is
    # the bounded query-side LUT/probe derivation (vec_id < query_max)
    codes_scans = [
        seg for seg in plan.split("Scan parquet")[1:] if "/codes" in seg[:400]
    ]
    assert codes_scans and all("embedding" not in seg[:400] for seg in codes_scans)


def test_text_index_scan_prunes_to_query_groups(spark, reg, sf_dir):
    """The persisted text-search serving contract: the postings scan must
    carry a bucket_group PartitionFilter (the query's posting groups as a
    static IN), so per-query scan cost is bounded by the query's features
    regardless of index size — the IVF probed-lists contract, for text."""
    from qradar_restapi_kafka_datapipeline_spark.entry_queries import (
        _TEXT_INDEX_MEMO,
    )
    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        text_knn_from_index,
    )

    reg["text_knn_indexed"].run(spark, sf_dir)  # builds + memoizes the index
    qtext = spark.table("documents").where("doc_id = 1").first()["text"]
    df = text_knn_from_index(
        spark, _TEXT_INDEX_MEMO[(id(spark), sf_dir)], qtext, k=3,
        query_id=1, exclude_id=1,
    )
    plan = _formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "no PartitionFilters on the postings scan"
    assert "bucket_group" in m.group(1), m.group(1)
    assert "INSET" in m.group(1) or "IN (" in m.group(1), m.group(1)


def test_pq_adc_scoring_broadcasts_lut_no_sort_merge(spark, reg, sf_dir):
    """The PQ/ADC serving contract (round 6, VERDICT r5 #2): the ADC scoring
    join is corpus-sized codes against a bounded per-query LUT — the LUT
    must broadcast; a SortMergeJoin here shuffles the whole corpus on
    (mi, j) at 100 TB."""
    plan = _formatted_plan(reg["knn_pq_adc"].run(spark, sf_dir))
    assert "SortMergeJoin" not in plan, "ADC scoring fell back to sort-merge"
    assert "BroadcastHashJoin" in plan


def test_quality_classifier_broadcasts_model(spark, reg, sf_dir):
    """The classifier-apply contract (round 6, VERDICT r5 #2): corpus
    featurization joins a <= dim+1-row weights relation — the model side
    must broadcast.  The one remaining shuffle join (docs LEFT JOIN summed
    contributions, both corpus-sized on doc_id) is the legitimate linear
    shuffle, so assert the model join specifically: no sort-merge on
    `bucket` anywhere in the plan."""
    plan = _formatted_plan(reg["curate_quality_classifier"].run(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    for m in re.finditer(r"\(\d+\) SortMergeJoin[^(]*(?:\n.*){0,4}", plan):
        assert "bucket" not in m.group(0), m.group(0)


def test_kmv_build_plans_bounded_topk_not_global_sort(spark, reg, sf_dir):
    """The KMV build contract (round 7): bottom-k of the distinct hashes
    must plan as TakeOrderedAndProject (per-partition heaps of k + a k-row
    driver merge) — a global Sort+Limit would shuffle-sort every distinct
    key at 100 TB."""
    from qradar_restapi_kafka_datapipeline_spark.operators import sketches as K

    plan = _formatted_plan(spark.sql(K.kmv_sketch_sql("spark")))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, (
        "bottom-k fell back to a global range sort"
    )


def test_hdr_cells_aggregate_partially_before_shuffle(spark, reg, sf_dir):
    """The HDR build contract (round 7): the cells groupBy must carry a
    map-side partial aggregate, so the shuffle moves the bounded bucket
    keyspace, never the corpus."""
    from qradar_restapi_kafka_datapipeline_spark.operators import sketches as K

    plan = _formatted_plan(spark.sql(K.hdr_cells_sql("spark")))
    assert "partial_count" in plan or "Partial" in plan, plan
    assert "CartesianProduct" not in plan


def test_dsir_apply_broadcasts_frozen_selector(spark, reg, sf_dir):
    """The frozen-apply contract (round 7): the batch's counts join the
    <= dim-row (bucket, l6) artifact — the selector side must broadcast;
    a SortMergeJoin on bucket shuffles the whole batch's postings."""
    import re as _re

    plan = _formatted_plan(reg["curate_dsir_apply"].run(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    for m in _re.finditer(r"\(\d+\) SortMergeJoin[^(]*(?:\n.*){0,4}", plan):
        assert "bucket" not in m.group(0), m.group(0)


def test_pinned_sketch_serving_plans_never_rescan_the_corpus(spark, reg, sf_dir):
    """The literal-pin contract (CLAUDE.md CTE-re-execution trap): the
    returned rank/rolling/jaccard relations must be served entirely from
    the bounded pinned summaries — any parquet scan in the serving plan
    means a CTE reference is re-reading the corpus."""
    for name in (
        "sketch_rank_quantiles",
        "sketch_rank_grouped",
        "sketch_hll_rolling_distinct",
        "sketch_kmv_jaccard",
    ):
        plan = _formatted_plan(reg[name].run(spark, sf_dir))
        assert "Scan parquet" not in plan and "FileScan" not in plan, name


def test_chunk_knn_serving_broadcasts_query_vector(spark, reg, sf_dir):
    """Chunk retrieval's serving contract: the dot join is corpus-sized
    chunk postings against a <= dim-row pinned query vector — the query
    side must broadcast (no SortMergeJoin on bucket anywhere)."""
    import re as _re

    plan = _formatted_plan(reg["text_chunk_knn"].run(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    for m in _re.finditer(r"\(\d+\) SortMergeJoin[^(]*(?:\n.*){0,4}", plan):
        assert "bucket" not in m.group(0), m.group(0)
