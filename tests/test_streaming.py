"""Streaming ingest + roll-up tests (SURVEY §5 item 4).

File-source streams stand in for Kafka (same Source API, no broker needed):
JSONL landing dir → pinned-schema stream → normalize → summing roll-up sink.
Late-data policy: exact mode folds unbounded lateness; watermark mode drops.
"""

import json
import os

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.sources.ingest import (
    normalize_stream,
    read_jsonl_stream,
    table_name,
)
from qradar_restapi_kafka_datapipeline_spark.streaming.rollup_stream import (
    streaming_rollup_exact,
    streaming_rollup_watermarked,
)

EV = dict(
    domainName="customer_1", domainId=1, eventCount=2, sourceIP="10.0.0.1",
    destinationIP="8.8.8.8", sourcePort=1000, destinationPort=53,
    qid=5, category=4002, highlevelcategory=4000, devicetype=3,
    logSourceId=7, userName="u1", magnitude=5,
)


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def _rows(ts_list):
    return [{**EV, "startTime": t} for t in ts_list]


H10 = 1_721_383_200_000  # 2024-07-19 10:00:00 UTC in ms
H11 = H10 + 3_600_000


def test_stream_ingest_to_exact_rollup(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    _write_jsonl(f"{src}/page0.jsonl", _rows([H10 + 60_000, H10 + 120_000, H11]))
    stream = normalize_stream(read_jsonl_stream(spark, src))
    q = streaming_rollup_exact(stream, out, ckpt)
    q.awaitTermination(120)

    got = {
        r["Start_Time"]: r["Event_Count"]
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 2
    assert sorted(got.values()) == [2, 4]  # two rows in hour 10, one in hour 11

    # late page arrives — a NEW availableNow run folds it in (checkpoint
    # resumes from the recorded offset, so only the new file is read)
    _write_jsonl(f"{src}/page1.jsonl", _rows([H10 + 300_000]))
    stream2 = normalize_stream(read_jsonl_stream(spark, src))
    q2 = streaming_rollup_exact(stream2, out, ckpt)
    q2.awaitTermination(120)
    got2 = {
        r["Start_Time"]: r["Event_Count"]
        for r in spark.read.parquet(out).collect()
    }
    assert sorted(got2.values()) == [2, 6]  # late row folded into hour 10


def test_exact_rollup_replayed_epoch_is_idempotent(spark, tmp_path):
    """Crash between merge and checkpoint-commit ⇒ Spark replays the epoch.

    An aggregate-ADD sink double-counts on replay unless the epoch ledger
    skips it — simulate the crash by deleting the checkpoint commit marker
    for epoch 0 (offsets survive, commit doesn't: exactly the replay window)
    and restarting from the same checkpoint.
    """
    src = str(tmp_path / "landing")
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    _write_jsonl(f"{src}/page0.jsonl", _rows([H10 + 60_000, H10 + 120_000, H11]))
    stream = normalize_stream(read_jsonl_stream(spark, src))
    q = streaming_rollup_exact(stream, out, ckpt)
    q.awaitTermination(120)
    q.stop()  # release the checkpoint lease before restarting over it
    before = sorted(
        (r["Start_Time"], r["Event_Count"])
        for r in spark.read.parquet(out).collect()
    )

    # the crash window: commit marker gone (incl. the local-FS .crc sidecar,
    # or the atomic rename that rewrites it trips over the stale checksum)
    os.remove(os.path.join(ckpt, "commits", "0"))
    os.remove(os.path.join(ckpt, "commits", ".0.crc"))
    stream2 = normalize_stream(read_jsonl_stream(spark, src))
    streaming_rollup_exact(stream2, out, ckpt).awaitTermination(120)
    after = sorted(
        (r["Start_Time"], r["Event_Count"])
        for r in spark.read.parquet(out).collect()
    )
    assert after == before  # replayed epoch folded ZERO new rows


def test_stream_watermarked_rollup(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "rollup_wm")
    ckpt = str(tmp_path / "ckpt_wm")
    _write_jsonl(f"{src}/page0.jsonl", _rows([H10, H10 + 60_000, H11]))
    stream = normalize_stream(read_jsonl_stream(spark, src))
    q = streaming_rollup_watermarked(stream, out, ckpt, watermark="1 hour")
    q.awaitTermination(120)
    # append mode emits a window only once the watermark passes its end; the
    # max event time so far (11:00) minus 1 h leaves both windows open.
    # A later batch advances the watermark and flushes them:
    _write_jsonl(f"{src}/page1.jsonl", _rows([H10 + 4 * 3_600_000]))
    stream2 = normalize_stream(read_jsonl_stream(spark, src))
    q2 = streaming_rollup_watermarked(stream2, out, ckpt, watermark="1 hour")
    q2.awaitTermination(120)
    df = spark.read.parquet(out)
    got = {r["Start_Time"]: r["Event_Count"] for r in df.collect()}
    assert sorted(got.values()) == [2, 4]  # hours 10 and 11 closed + emitted
    assert len(got) == 2  # the 14:00 window is still open (late-drop policy)


def test_normalized_stream_schema(spark, tmp_path):
    src = str(tmp_path / "landing")
    _write_jsonl(f"{src}/p.jsonl", _rows([H10]))
    stream = normalize_stream(read_jsonl_stream(spark, src))
    assert stream.isStreaming
    cols = set(stream.columns)
    assert {"Event_Count", "Start_Time", "WeekFrom", "ReportDate", "Source_IP"} <= cols


def test_table_name_sanitization():
    # reference etl.py:68-77 strips space ' " & _ from the customer name
    assert table_name("Cust omer&_1", "AllowedInbound") == "Customer1_AllowedInbound"


def test_streaming_dsir_apply_crash_replay_matches_batch(spark, sf_dir, tmp_path):
    """Round 7 (VERDICT r6 #4): the frozen-selector apply streamed per
    micro-batch must equal the one-shot batch apply doc-for-doc, INCLUDING
    after an injected crash between a scored-part write and the epoch
    commit (the replay window) — per-epoch parts make replay overwrite its
    own output."""
    from qradar_restapi_kafka_datapipeline_spark.operators import curation as C
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables
    from qradar_restapi_kafka_datapipeline_spark.streaming.curation_stream import (
        dsir_apply_streaming,
    )

    load_tables(spark, sf_dir)
    art = str(tmp_path / "dsir_lam")
    C.build_dsir_selector(spark, art)
    new_batch = (
        "(SELECT doc_id + 100000 AS doc_id, text FROM documents "
        "WHERE doc_id % 7 = 0)"
    )
    batch = {
        (r["doc_id"], r["dsir_score"], r["keep"])
        for r in spark.sql(
            C.dsir_apply_sql("spark", art, new_batch)
        ).collect()
    }
    streamed = {
        (r["doc_id"], r["dsir_score"], r["keep"])
        for r in dsir_apply_streaming(
            spark, art, new_batch, _crash_after_write_epoch=1
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_bm25_streaming_index_crash_replay_and_compaction(spark, sf_dir):
    """Round 8: the incrementally-maintained BM25 index must serve the
    EXACT one-shot ranking — through an injected crash after a part write
    (the replay window: per-epoch parts make the replayed batch overwrite
    its own tf part), and again after the committed-frontier compactor
    folds the part tree (tf sums over disjoint-doc epochs are
    merge-neutral)."""
    from qradar_restapi_kafka_datapipeline_spark.operators.sketches import (
        compact_sketch_parts,
    )
    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        bm25_index_streaming,
        bm25_topk_sql,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    key = lambda rows: [(r["doc_id"], r["score"], r["rk"]) for r in rows]
    oneshot = key(spark.sql(bm25_topk_sql("spark")).collect())
    assert len(oneshot) == 10

    parts_info = []
    streamed = key(
        bm25_index_streaming(
            spark, _crash_after_write_epoch=1, _parts_out=parts_info
        ).collect()
    )
    assert streamed == oneshot

    parts, ckpt = parts_info
    folded = compact_sketch_parts(
        spark, parts, ("doc_id", "word"), {"tf": "sum"}, checkpoint_dir=ckpt
    )
    assert folded == 3  # all three epochs committed → all fold
    merged = f"(SELECT doc_id, word, tf FROM parquet.`{parts}`)"
    assert key(
        spark.sql(bm25_topk_sql("spark", tf_rel=merged)).collect()
    ) == oneshot


def test_chunk_streaming_index_crash_replay(spark, sf_dir):
    """Round 8: the incrementally-maintained chunk index serves the exact
    one-shot chunk retrieval through an injected crash + replay (per-epoch
    parts; chunking is per-doc local so a replayed batch rewrites exactly
    its own chunks' tf part)."""
    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        chunk_index_streaming,
        chunk_knn_sql,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    key = lambda rows: [
        (r["chunk_doc_id"], r["chunk_start"], r["cos"]) for r in rows
    ]
    oneshot = key(spark.sql(chunk_knn_sql("spark")).collect())
    assert len(oneshot) == 10
    streamed = key(
        chunk_index_streaming(spark, _crash_after_write_epoch=1).collect()
    )
    assert streamed == oneshot


def test_phash_streaming_index_crash_replay(spark, sf_dir):
    """Round 9: the incrementally-maintained perceptual-hash index serves
    the exact one-shot cluster dedup through an injected crash + replay
    (hashing is per-image local, so a replayed batch rewrites exactly its
    own (doc, hash) part), and the committed-frontier compactor folds all
    epochs without changing the served result."""
    from qradar_restapi_kafka_datapipeline_spark.operators.multimodal import (
        image_phash_clusters,
        phash_clusters_sql,
        phash_index_streaming,
    )
    from qradar_restapi_kafka_datapipeline_spark.operators.sketches import (
        compact_sketch_parts,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    key = lambda rows: sorted(
        (r["canon_a"], r["canon_b"], r["n_a"], r["n_b"], r["hamming"])
        for r in rows
    )
    oneshot = key(
        image_phash_clusters(spark, spark.table("documents")).collect()
    )
    assert len(oneshot) > 0

    parts_info = []
    streamed = key(
        phash_index_streaming(
            spark, _crash_after_write_epoch=1, _parts_out=parts_info
        ).collect()
    )
    assert streamed == oneshot

    # hash rows are per-image facts (no additive measure): compaction is
    # a pure rewrite — key on the full row with MAX as the no-op fold
    parts, ckpt = parts_info
    folded = compact_sketch_parts(
        spark, parts, ("doc_id", "hash_hi"), {"hash_lo": "max"},
        checkpoint_dir=ckpt,
    )
    assert folded == 3
    merged = f"SELECT doc_id, hash_hi, hash_lo FROM parquet.`{parts}`"
    assert key(
        spark.sql(phash_clusters_sql("spark", merged)).collect()
    ) == oneshot


def test_hysteresis_streaming_crash_replay(spark, sf_dir):
    """Round 10 (VERDICT r9 #7): streamed hysteresis alerting must serve
    the EXACT one-shot episode set through an injected crash after a
    rate-part write plus checkpoint replay.  Daily (type, day) rates are
    the exactly-once additive unit (per-epoch parts, SUM-merge at read);
    episodes — thresholds, crossings, consecutive-day islands — derive
    from the merged rates, so a double-folded batch would shift a rate
    across a threshold boundary and change the episode set."""
    from qradar_restapi_kafka_datapipeline_spark.operators.sessionize import (
        hysteresis_alerts_sql,
        hysteresis_streaming,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    key = lambda rows: sorted(
        (r["event_type"], r["start_day"], r["end_day"], r["n_days"],
         r["peak_rate"])
        for r in rows
    )
    oneshot = key(spark.sql(hysteresis_alerts_sql("spark", 105, 99)).collect())
    assert len(oneshot) > 0
    streamed = key(
        hysteresis_streaming(
            spark, 105, 99, _crash_after_write_epoch=1
        ).collect()
    )
    assert streamed == oneshot


def test_ivf_streaming_append_crash_replay_matches_one_shot(
    spark, sf_dir, tmp_path
):
    """Round 11 (VERDICT r10 #3): streamed vector arrivals folded as
    per-epoch immutable assignment parts must leave the index IDENTICAL
    to a one-shot frozen-quantizer append — through an injected crash
    after a part write plus checkpoint replay.  Assignment under a
    frozen quantizer is a pure per-row function, so the comparison is
    row-for-row on the full merged assignment relation, then on the
    served top-k."""
    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        _merged_assignments,
        append_to_ivf_index,
        build_ivf_index,
        ivf_append_streaming,
        knn_ivf_from_index,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    base_a = str(tmp_path / "one_shot")
    base_b = str(tmp_path / "streamed")
    # identical deterministic training input => identical quantizers
    build_ivf_index(spark, emb.where("vec_id % 7 != 0"), base_a)
    build_ivf_index(spark, emb.where("vec_id % 7 != 0"), base_b)
    append_to_ivf_index(spark, base_a, emb.where("vec_id % 7 = 0"))
    ivf_append_streaming(
        spark, base_b, emb.where("vec_id % 7 = 0"),
        _crash_after_write_epoch=1,
    )
    nlists = spark.read.parquet(f"{base_a}/centroids").count()
    probed = list(range(nlists))

    def rel(path):
        return sorted(
            (r["vec_id"], r["list_id"], tuple(round(float(x), 6)
                                              for x in r["embedding"]))
            for r in _merged_assignments(
                spark, path, probed, "vec_id", "embedding"
            ).collect()
        )

    assert rel(base_a) == rel(base_b)

    def serve(path):
        return sorted(
            (r["q_id"], r["n_id"], r["cos"], r["rk"])
            for r in knn_ivf_from_index(
                spark, path, emb.where("vec_id < 10"), k=3
            ).collect()
        )

    assert serve(base_a) == serve(base_b)


def test_ivf_rebalance_compacts_streamed_log(spark, sf_dir, tmp_path):
    """The rebuild IS the streamed log's compaction: after a rebalance,
    the log directory is gone, every streamed vector lives in the
    retrained assignments tree, and the serve still sees the full
    corpus."""
    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append_streaming,
        rebalance_ivf_index,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables
    import os

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    base = str(tmp_path / "compact")
    build_ivf_index(spark, emb.where("vec_id % 7 != 0"), base)
    ivf_append_streaming(spark, base, emb.where("vec_id % 7 = 0"))
    n_total = emb.count()
    n = rebalance_ivf_index(spark, base)
    assert n == n_total
    assert not os.path.exists(f"{base}/assignments_stream")
    assert (
        spark.read.parquet(f"{base}/assignments").select("vec_id")
        .distinct().count() == n_total
    )


def test_ivf_delete_serves_remaining_and_rebalance_compacts(
    spark, sf_dir, tmp_path
):
    """Round 11: tombstone deletes — serve-after-delete must equal a
    one-shot build over the remaining ids exactly (the anti-join can
    neither leak a deleted vector nor drop a live one), deletes must be
    idempotent, and the next rebalance physically drops the rows and
    clears the log."""
    import os

    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        build_ivf_index,
        delete_from_ivf_index,
        knn_ivf_from_index,
        rebalance_ivf_index,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    base = str(tmp_path / "with_deletes")
    ref = str(tmp_path / "remaining_only")
    build_ivf_index(spark, emb, base)
    dels = emb.where("vec_id % 9 = 0").select("vec_id")
    delete_from_ivf_index(spark, base, dels)
    delete_from_ivf_index(spark, base, dels)  # idempotent
    build_ivf_index(spark, emb.where("vec_id % 9 != 0"), ref)

    def serve(path):
        # FULL probe: the two indexes carry different quantizers (base
        # trained on the full corpus, ref on the remaining set), so
        # approximate nprobe results may legitimately differ — at full
        # probe both are the exact top-k over the live candidate set.
        nlists = spark.read.parquet(f"{path}/centroids").count()
        return sorted(
            (r["q_id"], r["n_id"], r["cos"], r["rk"])
            for r in knn_ivf_from_index(
                spark, path, emb.where("vec_id < 10"), k=3, nprobe=nlists
            ).collect()
        )

    got, want = serve(base), serve(ref)
    assert got == want
    assert not any(n % 9 == 0 for _q, n, _c, _r in got)

    n_remaining = emb.where("vec_id % 9 != 0").count()
    n = rebalance_ivf_index(spark, base)
    assert n == n_remaining
    assert not os.path.exists(f"{base}/tombstones")
    assert (
        spark.read.parquet(f"{base}/assignments")
        .where("vec_id % 9 = 0").count() == 0
    )
    assert serve(base) == want  # still the remaining-only result


def test_ivfpq_serve_honors_tombstones(spark, sf_dir, tmp_path):
    """The PQ serve shares the tombstone-log convention: after a delete,
    neither the ADC ranking nor the refined serve may return a deleted
    id, and live results must match a build over the remaining set at
    the same quantizer artifacts (the codes anti-join is the only
    change)."""
    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        build_ivfpq_index,
        delete_from_ivf_index,
        knn_ivfpq_from_index,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    base = str(tmp_path / "pq_del")
    build_ivfpq_index(spark, emb, base)
    before = knn_ivfpq_from_index(spark, base, dim=64, refine_k=60).collect()
    deleted = {int(r["n_id"]) for r in before[:2]}
    delete_from_ivf_index(
        spark, base,
        spark.createDataFrame([(i,) for i in deleted], "vec_id LONG"),
    )
    for kw in ({}, {"refine_k": 60}):
        rows = knn_ivfpq_from_index(spark, base, dim=64, **kw).collect()
        assert rows and not any(int(r["n_id"]) in deleted for r in rows)


def test_ivf_compaction_is_value_neutral_and_crash_safe(
    spark, sf_dir, tmp_path
):
    """compact_ivf_index keeps the quantizer, so serving is IDENTICAL
    before and after at the default (approximate) nprobe — a stronger
    pin than the rebalance tests can make; the log dirs are gone, and a
    mid-swap crash state self-heals via the shared recovery protocol."""
    import os

    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        build_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
        ivf_append_streaming,
        knn_ivf_from_index,
        recover_ivf_index,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    base = str(tmp_path / "compact_neutral")
    build_ivf_index(spark, emb.where("vec_id % 7 != 0"), base)
    ivf_append_streaming(spark, base, emb.where("vec_id % 7 = 0"))
    delete_from_ivf_index(
        spark, base, emb.where("vec_id % 11 = 0").select("vec_id")
    )

    def serve():
        return sorted(
            (r["q_id"], r["n_id"], r["cos"], r["rk"])
            for r in knn_ivf_from_index(
                spark, base, emb.where("vec_id < 10"), k=3
            ).collect()
        )

    before = serve()
    n_live = (
        emb.where("vec_id % 11 != 0").count()
    )
    n = compact_ivf_index(spark, base)
    assert n == n_live
    assert not os.path.exists(f"{base}/assignments_stream")
    assert not os.path.exists(f"{base}/tombstones")
    assert serve() == before  # value-neutral at the approximate probe
    # mid-swap crash state self-heals (shared recovery protocol)
    os.rename(base, base + ".__rebal_old")
    assert recover_ivf_index(spark, base) == "restored_old"
    assert serve() == before


def test_streamed_globalview_parts_parity_routing_and_crash(
    spark, sf_dir, tables
):
    """Round 12 (VERDICT r11 #8): the composed reference-shaped path.
    (a) per-epoch view parts merge to EXACTLY the one-shot GLOBALVIEW
    aggregate (all four state columns); (b) an injected crash after a
    part write replays to the same state; (c) the aggregate navigator
    routed over the STREAMED view really scans the parts relation (a
    silent fall-through to raw events would pass the value gate while
    voiding the composition claim)."""
    from qradar_restapi_kafka_datapipeline_spark.plans.aql import AQLFrontend
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import (
        register_qevents,
    )
    from qradar_restapi_kafka_datapipeline_spark.streaming.rollup_stream import (
        globalview_streaming_parts,
    )
    from qradar_restapi_kafka_datapipeline_spark.views import (
        globalview_sql,
        register_globalviews,
    )

    register_qevents(spark, sf_dir)
    view = "MongoDB_AuthenticationFailure"

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    want = rows(spark.sql(globalview_sql(view)))
    merged = globalview_streaming_parts(spark, view)
    assert rows(merged) == want
    crashed = globalview_streaming_parts(
        spark, view, _crash_after_write_epoch=0
    )
    assert rows(crashed) == want

    # navigator over the streamed view: value-equal to raw AND the plan
    # actually reads the parts relation
    register_globalviews(spark)
    frontend = AQLFrontend(spark)
    aql = (
        "SELECT domainId, userName, CAST(SUM(eventCount) AS BIGINT) AS t "
        "FROM events WHERE eventName = 'error' GROUP BY domainId, userName"
    )
    raw = rows(frontend.sql(aql))
    merged.createOrReplaceTempView(view)
    try:
        routed = frontend.sql(aql, auto_route=True)
        assert rows(routed) == raw
        plan = routed._jdf.queryExecution().optimizedPlan().toString()
        # scans the streamed parts relation (only it carries the epoch
        # partition column and the view state columns), not raw events
        assert "epoch#" in plan and "SUM_eventCount#" in plan
        assert "qevents" not in plan
    finally:
        register_globalviews(spark)


def test_ivfpq_streamed_append_equals_oneshot_encode_and_crash_replay(
    spark, sf_dir, tmp_path
):
    """Round 12 (VERDICT r11 #2): the COMPRESSED index's streamed append.
    Arrivals encoded under the FROZEN codebooks + quantizer into
    per-epoch immutable code parts must serve (ADC and refined)
    identically to an index whose codes/ tree was encoded over the full
    corpus in ONE SHOT under the same artifacts — code assignment under
    frozen artifacts is a pure per-row function, so any divergence means
    a lost/duplicated epoch or a drifting encoder.  A crash injected
    after a code-part write replays from the checkpoint to the same
    result."""
    import shutil

    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        build_ivfpq_index,
        ivf_assign_sql,
        ivfpq_append_streaming,
        knn_ivfpq_from_index,
        pq_codes_sql,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    base = str(tmp_path / "pq_stream")
    emb.where("vec_id % 7 != 0").createOrReplaceTempView("__pqs_base_src")
    build_ivfpq_index(spark, emb.where("vec_id % 7 != 0"), base,
                      source_view="__pqs_base_src")
    ivfpq_append_streaming(spark, base, emb.where("vec_id % 7 = 0"), dim=64)

    # one-shot reference: SAME frozen artifacts, full-corpus encode
    ref = str(tmp_path / "pq_oneshot")
    shutil.copytree(f"{base}/centroids", f"{ref}/centroids")
    shutil.copytree(f"{base}/codebooks", f"{ref}/codebooks")
    assign = spark.sql(
        ivf_assign_sql("spark", f"{ref}/centroids", 64, 1, "embeddings")
    ).select("vec_id", "list_id")
    codes = spark.sql(
        pq_codes_sql("spark", f"{ref}/codebooks", 16, 4, "embeddings")
    )
    codes.join(assign, "vec_id").write.partitionBy("list_id").parquet(
        f"{ref}/codes"
    )

    def serve(path, **kw):
        return sorted(
            tuple(r) for r in knn_ivfpq_from_index(
                spark, path, dim=64, **kw
            ).collect()
        )

    for kw in ({}, {"refine_k": 60}):
        got, want = serve(base, **kw), serve(ref, **kw)
        assert got and got == want

    # crash replay: kill after the first code-part write, restart from
    # the same checkpoint — the replayed epoch overwrites its own part
    crashed = str(tmp_path / "pq_crash")
    shutil.copytree(f"{base}/centroids", f"{crashed}/centroids")
    shutil.copytree(f"{base}/codebooks", f"{crashed}/codebooks")
    shutil.copytree(f"{base}/codes", f"{crashed}/codes")
    ivfpq_append_streaming(
        spark, crashed, emb.where("vec_id % 7 = 0"), dim=64,
        _crash_after_write_epoch=0,
    )
    assert serve(crashed, refine_k=60) == serve(ref, refine_k=60)

    # codebook-preserving compaction (round 12): fold the code log +
    # tombstones into the base tree — the trained artifacts untouched,
    # serving value-identical at the approximate probe, log dirs gone
    import os as _os

    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        compact_ivfpq_index,
        delete_from_ivf_index,
    )

    delete_from_ivf_index(
        spark, base, emb.where("vec_id % 11 = 0").select("vec_id")
    )
    before = serve(base, refine_k=60)
    n = compact_ivfpq_index(spark, base)
    assert n == emb.where("vec_id % 11 != 0").count()
    assert not _os.path.exists(f"{base}/codes_stream")
    assert not _os.path.exists(f"{base}/tombstones")
    assert spark.read.parquet(f"{base}/codes") \
        .where("vec_id % 11 = 0").count() == 0
    assert serve(base, refine_k=60) == before


def test_ivf_compaction_full_delete_fails_loudly(spark, sf_dir, tmp_path):
    """ADVICE r11: compacting an index whose every vector is tombstoned
    (the legitimate GDPR full-wipe state) must raise a clear error BEFORE
    staging — not die in the read-back with 'unable to infer schema' —
    and must leave the live index untouched and still servable."""
    import pytest as _pytest

    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        build_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
        knn_ivf_from_index,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    base = str(tmp_path / "full_wipe")
    build_ivf_index(spark, emb, base)
    delete_from_ivf_index(spark, base, emb.select("vec_id"))
    with _pytest.raises(ValueError, match="empty after applying tombstones"):
        compact_ivf_index(spark, base)
    # fail-safe: the live tree is intact (tombstones still mask everything,
    # so a serve returns zero rows but does not error)
    assert knn_ivf_from_index(
        spark, base, emb.where("vec_id < 3"), k=3
    ).count() == 0
