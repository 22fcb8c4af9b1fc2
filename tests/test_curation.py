"""Unit tests for the training-data curation layer (operators/curation.py).

Covers the three ops' semantic contracts on small constructed inputs (packing
invariants, sampling determinism, funnel dedup rule); the registry entries
cross-check the same ops against DuckDB at the gate SFs.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source=s) for i, t, s in rows]
    )


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_next_fit_order_and_budget(spark):
    # tokens = ceil(len/4): 25 chars -> 7 tokens each; budget 20 -> bins of 2
    rows = [(i, "x" * 25, "s") for i in range(5)]
    out = C.pack_sequences(_docs(spark, rows), budget=20, shard_size=1000)
    got = {r.doc_id: (r.bin_id, r.n_tokens) for r in out.collect()}
    assert got == {0: (0, 7), 1: (0, 7), 2: (1, 7), 3: (1, 7), 4: (2, 7)}


def test_pack_truncates_oversized_doc(spark):
    rows = [(0, "x" * 1000, "s"), (1, "x" * 8, "s")]
    out = C.pack_sequences(_docs(spark, rows), budget=50, shard_size=1000)
    by_id = {r.doc_id: r for r in out.collect()}
    assert by_id[0].n_tokens == 50  # ceil(1000/4)=250 capped at budget
    assert by_id[0].bin_id != by_id[1].bin_id  # full bin can't take doc 1


def test_pack_shards_bound_group_size(spark):
    rows = [(i, "x" * 25, "s") for i in range(10)]
    out = C.pack_sequences(_docs(spark, rows), budget=1000, shard_size=5)
    shards = {r.doc_id: r.shard for r in out.collect()}
    assert shards[4] == 0 and shards[5] == 1  # bins never cross shards
    bins = out.groupBy("shard", "bin_id").count().collect()
    assert all(r["count"] <= 5 for r in bins)


def test_pack_contract_booleans_hold(spark, tables):
    out = C.pack_contract(spark.table("documents"), budget=512, shard_size=100)
    rows = out.collect()
    assert rows and all(r.all_bins_within_budget for r in rows)
    assert all(r.bin_count_within_bound for r in rows)


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_sample_deterministic_and_rate_gated(spark):
    rows = [(i, "t", "keep" if i % 2 else "drop") for i in range(200)]
    df = _docs(spark, rows)
    full = C.stratified_sample(df, {"keep": 10000, "drop": 0}, default_bp=0)
    ids = sorted(r.doc_id for r in full.collect())
    assert ids == [i for i in range(200) if i % 2]  # keep-all + drop-all exact
    again = sorted(r.doc_id for r in full.collect())
    assert ids == again  # pure function of ids, no RNG state


def test_sample_rate_is_approximate_at_partial_bp(spark):
    rows = [(i, "t", "s") for i in range(1000)]
    kept = C.stratified_sample(_docs(spark, rows), {}, default_bp=5000).count()
    assert 400 <= kept <= 600  # md5 uniformity, 50% +- 10pp


def test_sample_hash_slot_matches_portable_hash(spark):
    rows = [(7, "t", "s")]
    out = C.stratified_sample(_docs(spark, rows), {}, default_bp=10000).collect()
    expect = spark.sql(
        f"SELECT {C.portable_id_hash_sql('7', 'spark')} % 10000 AS h"
    ).collect()[0].h
    assert out[0].hash_slot == expect


# ---------------------------------------------------------------------------
# curate_corpus
# ---------------------------------------------------------------------------


def test_curate_dedup_keeps_lowest_doc_id(spark):
    good = (
        "the cat and the dog of the house and the yard went to the market "
        "and the sellers of the town saw the animals and the people. " * 4
    )
    rows = [(10, good, "a"), (3, good, "b"), (5, good + " extra", "c")]
    df = _docs(spark, rows)
    df.createOrReplaceTempView("curate_in")
    out = spark.sql(C.curate_corpus_sql("spark", table="curate_in")).collect()
    ids = sorted(r.doc_id for r in out)
    assert 3 in ids and 10 not in ids  # exact dup canonicalizes to min id
    assert 5 in ids  # near-dup (different fingerprint) survives


def test_curate_filters_short_and_nonenglish(spark):
    rows = [
        (1, "el la los y el la los y " * 10, "a"),  # spanish markers
        (2, "the and of " * 2, "a"),  # too short (< 5 words after trim? no — 6 words, but low quality)
        (3, "word", "a"),  # 1 word
    ]
    df = _docs(spark, rows)
    df.createOrReplaceTempView("curate_in2")
    out = spark.sql(
        C.curate_corpus_sql("spark", table="curate_in2", min_quality=0.0)
    ).collect()
    ids = {r.doc_id for r in out}
    assert 1 not in ids  # lang_pred = es
    assert 3 not in ids  # below min_words


# ---------------------------------------------------------------------------
# blocklist screen
# ---------------------------------------------------------------------------


def test_blocklist_verdict_precedence_and_word_boundary(spark):
    rows = [
        (0, "clean text here", "bad_src"),       # source block wins over term
        (1, "contains dup word", "ok"),          # term hit
        (2, "duplicate is not dup-free", "ok"),  # 'duplicate' must NOT match \bdup\b... but 'dup-free' does ('-' is a boundary)
        (3, "totally fine", "ok"),
    ]
    _docs(spark, rows).createOrReplaceTempView("bl_in")
    out = spark.sql(
        C.blocklist_verdict_sql(
            "spark", blocked_sources=("bad_src",), blocked_terms=("dup",),
            table="bl_in",
        )
    ).collect()
    v = {r.doc_id: r.verdict for r in out}
    assert v == {0: "blocked_source", 1: "blocked_term",
                 2: "blocked_term", 3: "kept"}


def test_blocklist_word_boundary_rejects_substrings(spark):
    rows = [(0, "deduplication discussed", "ok"), (1, "a dup here", "ok")]
    _docs(spark, rows).createOrReplaceTempView("bl_in2")
    out = spark.sql(
        C.blocklist_verdict_sql(
            "spark", blocked_sources=(), blocked_terms=("dup",), table="bl_in2"
        )
    ).collect()
    v = {r.doc_id: r.verdict for r in out}
    assert v == {0: "kept", 1: "blocked_term"}


def test_blocklist_semijoin_matches_inline_form(spark):
    from pyspark.sql import Row

    rows = [
        (0, "alpha beta gamma", "s"),
        (1, "delta dup epsilon", "s"),
        (2, "zeta DUP eta", "s"),      # case-insensitive via lower()
        (3, "theta iota", "s"),
    ]
    docs = _docs(spark, rows)
    terms = spark.createDataFrame([Row(term="dup"), Row(term="missingterm")])
    flagged = {r.doc_id for r in C.blocklist_semijoin(docs, terms).collect()}
    assert flagged == {1, 2}


# ---------------------------------------------------------------------------
# data mixing to target weights
# ---------------------------------------------------------------------------


def test_mix_to_target_balances_strata(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "mix_docs"
    )
    out = spark.sql(
        C.mix_to_target_sql("spark", table="mix_docs", strat_col="lang")
    )
    kept = out.groupBy("lang").count().collect()
    orig = {
        r["lang"]: r["count"]
        for r in spark.table("mix_docs").groupBy("lang").count().collect()
    }
    min_n = min(orig.values())
    for r in kept:
        # hash-gated binomial: realized counts track min_n within sampling
        # noise; the smallest stratum is kept whole (rate_bp = 10000)
        assert r["count"] <= orig[r["lang"]]
        assert abs(r["count"] - min_n) <= 0.5 * min_n
    full = {r["lang"] for r in kept if orig[r["lang"]] == min_n}
    smallest = {k for k, v in orig.items() if v == min_n}
    kept_counts = {r["lang"]: r["count"] for r in kept}
    for lang in smallest:
        assert kept_counts[lang] == orig[lang]


def test_mix_to_target_deterministic(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "mix_docs2"
    )
    q = C.mix_to_target_sql("spark", table="mix_docs2", strat_col="lang")
    a = {r["doc_id"] for r in spark.sql(q).collect()}
    b = {r["doc_id"] for r in spark.sql(q).collect()}
    assert a == b and a


def test_mix_temperature_rates_follow_sqrt_law(spark, sf_dir):
    import math

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "mix_docs3"
    )
    out = spark.sql(
        C.mix_temperature_sql("spark", table="mix_docs3", strat_col="lang")
    )
    orig = {
        r["lang"]: r["count"]
        for r in spark.table("mix_docs3").groupBy("lang").count().collect()
    }
    min_n = min(orig.values())
    rates = {
        r["lang"]: r["rate_bp"]
        for r in out.select("lang", "rate_bp").distinct().collect()
    }
    kept = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    for lang, n in orig.items():
        # rate_s = floor(√(n_min/n_s) · 1e4): the α=0.5 temperature law
        assert rates[lang] == int(math.sqrt(min_n / n) * 10000 + 1e-9)
        # realized keep tracks the rate within binomial noise
        exp = n * rates[lang] / 10000.0
        assert abs(kept.get(lang, 0) - exp) <= 4 * math.sqrt(exp) + 2
    # smallest stratum is kept whole; damping is monotone in stratum size
    smallest = min(orig, key=orig.get)
    assert rates[smallest] == 10000 and kept[smallest] == orig[smallest]
    by_size = sorted(orig, key=orig.get)
    assert all(
        rates[by_size[i]] >= rates[by_size[i + 1]]
        for i in range(len(by_size) - 1)
    )


# ---------------------------------------------------------------------------
# cross-engine parity on hostile text (unicode, emoji, whitespace, case)
# ---------------------------------------------------------------------------


def test_shared_sql_builders_agree_on_hostile_text(spark, tmp_path):
    """The dialect-shared SQL builders must produce bit-identical relations
    in Spark and DuckDB on inputs the clean synthetic corpus never shows:
    accents, CJK, surrogate-pair emoji, tabs/newlines, multi-space runs,
    leading/trailing whitespace, mixed case, and byte-identical duplicates."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from qradar_restapi_kafka_datapipeline_spark.operators.dedup import (
        passage_dedup_sql,
    )
    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        bigram_loglik_sql,
        normalized_md5_sql,
        tfidf_topk_sql,
        unigram_loglik_sql,
        winnow_fingerprints_sql,
    )

    docs = [
        (0, "héllo wörld ünïcode tëxt here okay"),
        (1, "héllo wörld ünïcode tëxt here okay"),  # byte-identical dup
        (2, "多 语 言 文 本 测 试"),
        (3, "tab\tseparated and\nnewline   multi  space ok"),
        (4, "single"),
        (5, "  leading and trailing   "),
        (6, "emoji 😀 text ok fine yes"),
        (7, "MIXED Case WORDS mixed case words"),
    ]
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
                "source": pa.array(
                    ["s" + str(d // 4) for d, _ in docs], pa.string()
                ),
            }
        ),
        path,
    )
    spark.read.parquet(path).createOrReplaceTempView("edge_docs")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW edge_docs AS SELECT * FROM '{path}'")

    from qradar_restapi_kafka_datapipeline_spark.operators.boilerplate import (
        boilerplate_coverage_sql,
        boilerplate_ngrams_sql,
    )
    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        corpus_vocab_stats_sql,
        repetition_stats_sql,
        winnow_overlap_sql,
    )

    builders = [
        lambda d: passage_dedup_sql(d, k=3, min_dup_docs=2, table="edge_docs"),
        lambda d: unigram_loglik_sql(d, "edge_docs"),
        lambda d: tfidf_topk_sql(d, k=2, source="edge_docs"),
        lambda d: winnow_fingerprints_sql(d, k=2, window=3, source="edge_docs"),
        lambda d: winnow_overlap_sql(d, k=2, window=3, min_shared=1,
                                     source="edge_docs"),
        lambda d: bigram_loglik_sql(d, "edge_docs"),
        lambda d: corpus_vocab_stats_sql(d, "edge_docs"),
        lambda d: repetition_stats_sql(d, "edge_docs"),
        lambda d: boilerplate_ngrams_sql(d, min_docs=2, source="edge_docs"),
        lambda d: boilerplate_coverage_sql(d, min_docs=2, source="edge_docs"),
        lambda d: (
            f"SELECT doc_id, {normalized_md5_sql('text', d)} AS fp FROM edge_docs"
        ),
    ]
    for b in builders:
        got = sorted(tuple(r) for r in spark.sql(b("spark")).collect())
        want = sorted(tuple(r) for r in con.execute(b("duckdb")).fetchall())
        assert got == want and got


def test_blocklist_terms_with_regex_metachars_match_literally(spark):
    rows = [
        (0, "visit bad.example.com today", "ok"),
        (1, "visit badXexample.com today", "ok"),  # '.' must NOT match X
        (2, "crypto c-a-s-h offer", "ok"),
    ]
    _docs(spark, rows).createOrReplaceTempView("bl_meta")
    out = spark.sql(
        C.blocklist_verdict_sql(
            "spark",
            blocked_sources=(),
            blocked_terms=("bad.example.com", "c-a-s-h"),
            table="bl_meta",
        )
    ).collect()
    v = {r.doc_id: r.verdict for r in out}
    assert v[0] == "blocked_term"
    assert v[1] == "kept"
    assert v[2] == "blocked_term"


def test_blocklist_quote_bearing_config_is_sql_safe(spark, tmp_path):
    """Apostrophe-bearing config values must not break the generated SQL in
    either dialect (ADVICE r2: re.escape leaves ' alone, so it previously
    terminated the string literal early)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        (0, "well don't do that again", "src1"),
        (1, "clean text here", "o'reilly"),
        (2, "clean text here", "src1"),
    ]
    path = str(tmp_path / "bl_quote.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
                "text": pa.array([t for _, t, _ in docs], pa.string()),
                "source": pa.array([s for _, _, s in docs], pa.string()),
            }
        ),
        path,
    )
    spark.read.parquet(path).createOrReplaceTempView("bl_quote")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW bl_quote AS SELECT * FROM '{path}'")

    def build(d):
        return C.blocklist_verdict_sql(
            d,
            blocked_sources=("o'reilly",),
            blocked_terms=("don't",),
            table="bl_quote",
        )

    got = sorted(tuple(r) for r in spark.sql(build("spark")).collect())
    want = sorted(tuple(r) for r in con.execute(build("duckdb")).fetchall())
    assert got == want
    v = {r[0]: r[2] for r in got}
    assert v == {0: "blocked_term", 1: "blocked_source", 2: "kept"}


def test_hashed_embedding_pairs_find_planted_dups_only(spark, tmp_path):
    """Feature-hashed (bigram, signed) embeddings: a near-duplicate pair must
    score ~1.0 while unrelated docs stay below threshold — and Spark/DuckDB
    must agree bit-for-bit (exact-integer postings, one terminal sqrt)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        hashed_semantic_pairs_sql,
    )

    base = ("spark shuffles the sorted batches through the hash join "
            "while the window merges the stream parts").split()
    near = list(base)
    near[3] = "reordered"  # one token differs
    docs = [
        (0, " ".join(base)),
        (1, " ".join(near)),
        (2, "totally different words about cats dogs birds fish "
            "lizards mice owls and weather patterns today"),
        (3, "another unrelated line of text regarding music theory "
            "chords scales rhythm and tempo markings"),
    ]
    path = str(tmp_path / "hash_docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        ),
        path,
    )
    spark.read.parquet(path).createOrReplaceTempView("hash_docs")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW hash_docs AS SELECT * FROM '{path}'")
    sql_s = hashed_semantic_pairs_sql("spark", threshold=0.5, source="hash_docs")
    sql_d = hashed_semantic_pairs_sql("duckdb", threshold=0.5, source="hash_docs")
    got = sorted(tuple(r) for r in spark.sql(sql_s).collect())
    want = sorted(tuple(r) for r in con.execute(sql_d).fetchall())
    assert got == want
    assert [(a, b) for a, b, _ in got] == [(0, 1)]  # ONLY the planted pair
    assert got[0][2] > 0.8


def test_hashed_text_knn_ranks_planted_near_dup_first(spark, tmp_path):
    """Search serving: a query doc's planted near-duplicate must be its
    rank-1 hit, and both engines must agree on the full top-k."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        hashed_text_knn_sql,
    )

    base = ("the quick brown fox jumps over lazy dogs while rivers flow "
            "north past ancient stone bridges every winter morning").split()
    near = list(base)
    near[5] = "above"
    docs = [
        (0, " ".join(base)),                       # the query
        (1, " ".join(near)),                       # its near-dup
        (2, "completely different content about quantum chemistry and "
            "molecular orbital theory in modern computation"),
        (3, "unrelated sports commentary covering the match score goals "
            "penalties and the crowd reaction tonight"),
    ]
    path = str(tmp_path / "knn_docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        ),
        path,
    )
    spark.read.parquet(path).createOrReplaceTempView("knn_docs")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW knn_docs AS SELECT * FROM '{path}'")
    sql_s = hashed_text_knn_sql("spark", query_max=1, k=3, source="knn_docs")
    sql_d = hashed_text_knn_sql("duckdb", query_max=1, k=3, source="knn_docs")
    got = sorted(tuple(r) for r in spark.sql(sql_s).collect())
    want = sorted(tuple(r) for r in con.execute(sql_d).fetchall())
    assert got == want
    top = [r for r in got if r[3] == 1]
    assert top and top[0][1] == 1 and top[0][2] > 0.8  # near-dup is rank 1


def test_hashed_pairs_default_is_prefix_path_and_dense_guard_raises(spark, tables):
    """VERDICT r3 #3: the default call must land in the AllPairs prefix
    regime, and the explicitly-requested exhaustive regime must refuse dense
    postings rather than silently degenerate toward all-pairs."""
    import pytest as _pytest

    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        hashed_semantic_pairs,
    )

    # default == explicit prefix_m=4 (the scale-safe regime), value-equal
    d = {tuple(r) for r in hashed_semantic_pairs(spark, dim=4096).collect()}
    e = {tuple(r) for r in hashed_semantic_pairs(spark, dim=4096, prefix_m=4).collect()}
    assert d == e and len(d) > 0

    # exhaustive regime on dense docs (dim far below distinct bigrams/doc):
    # the density guard must raise, naming the remediations
    with _pytest.raises(ValueError, match="dense|prefix_m"):
        hashed_semantic_pairs(spark, dim=32, prefix_m=None)


def test_text_index_append_is_frozen_analyzer_exact(spark, tables, tmp_path):
    """Incremental text-index maintenance: appended docs' postings must be
    EXACTLY what the index's frozen analyzer (shipped stoplist) emits —
    per-doc dict equality against the driver-side featurizer — and an
    appended doc's own text must self-hit at cos 1.0 from the index."""
    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        _query_postings,
        append_to_text_index,
        build_text_index,
        text_knn_from_index,
    )

    path = str(tmp_path / "text_index")
    spark.sql("SELECT * FROM documents WHERE doc_id % 5 != 0").createOrReplaceTempView(
        "__tia_base"
    )
    spark.sql("SELECT * FROM documents WHERE doc_id % 5 = 0").createOrReplaceTempView(
        "__tia_new"
    )
    build_text_index(spark, path, source="__tia_base")
    append_to_text_index(spark, path, "__tia_new")
    stop = {r["feat"] for r in spark.read.parquet(f"{path}/stoplist").collect()}
    idx: dict = {}
    for r in spark.read.parquet(f"{path}/postings").where("doc_id % 5 = 0").collect():
        idx.setdefault(r["doc_id"], {})[r["bucket"]] = r["w"]
    docs = spark.table("__tia_new").collect()
    for d in docs[:30]:
        assert _query_postings(d["text"], stop, 4096) == idx.get(d["doc_id"], {}), (
            d["doc_id"])
    probe = docs[0]
    top = text_knn_from_index(spark, path, probe["text"], k=1).collect()
    assert top and top[0]["n_id"] == probe["doc_id"] and top[0]["cos"] == 1.0


def test_text_index_compaction_is_value_neutral(spark, tables, tmp_path):
    """Round 5: repeated appends accrete one file set per maintenance pass
    inside each bucket_group partition (plus norms appends); compaction must
    collapse the layout WITHOUT changing a single serving result."""
    import os

    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        append_to_text_index,
        build_text_index,
        compact_text_index,
        text_knn_from_index,
    )

    path = str(tmp_path / "text_index")
    spark.sql(
        "SELECT * FROM documents WHERE doc_id % 5 NOT IN (0, 1)"
    ).createOrReplaceTempView("__tic_base")
    build_text_index(spark, path, source="__tic_base")
    for r in (0, 1):  # two maintenance passes → two appended file sets
        spark.sql(
            f"SELECT * FROM documents WHERE doc_id % 5 = {r}"
        ).createOrReplaceTempView("__tic_new")
        append_to_text_index(spark, path, "__tic_new")

    def n_files(sub):
        out = 0
        for root, _dirs, files in os.walk(os.path.join(path, sub)):
            out += sum(f.endswith(".parquet") for f in files)
        return out

    probes = [r["text"] for r in spark.table("documents").limit(3).collect()]
    before = [
        sorted(map(tuple, text_knn_from_index(spark, path, t, k=5).collect()))
        for t in probes
    ]
    files_before = (n_files("postings"), n_files("norms"))
    assert files_before[1] >= 3  # base write + 2 appends

    n_parts = compact_text_index(spark, path)
    files_after = (n_files("postings"), n_files("norms"))
    assert n_parts > 0
    assert files_after[0] <= n_parts  # <= 1 file per bucket_group partition
    assert files_after[1] == 1
    assert files_after[0] < files_before[0]
    after = [
        sorted(map(tuple, text_knn_from_index(spark, path, t, k=5).collect()))
        for t in probes
    ]
    assert after == before

    # round 7: a compactor killed BETWEEN its two renames leaves norms/
    # staged out — recovery (run automatically on the next compaction)
    # must restore it and serving must resume unchanged
    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        recover_text_index_norms,
    )

    os.rename(os.path.join(path, "norms"),
              os.path.join(path, ".norms_compact_old"))
    assert recover_text_index_norms(spark, path) == "restored_old"
    assert recover_text_index_norms(spark, path) == "ok"
    healed = [
        sorted(map(tuple, text_knn_from_index(spark, path, t, k=5).collect()))
        for t in probes
    ]
    assert healed == before


class TestQualityClassifier:
    """Train-then-apply quality classifier (round 5): determinism, fidelity
    to the heuristic it distills, and holdout generalization."""

    def test_training_is_deterministic(self, spark, tables):
        from qradar_restapi_kafka_datapipeline_spark.operators.curation import (
            train_quality_classifier,
        )

        w1, b1 = train_quality_classifier(spark, sample_n=200, iters=50)
        w2, b2 = train_quality_classifier(spark, sample_n=200, iters=50)
        assert w1 == w2 and b1 == b2

    def test_distills_heuristic_and_generalizes(self, spark, tables, tmp_path):
        from qradar_restapi_kafka_datapipeline_spark.operators.curation import (
            quality_classifier_sql,
            train_quality_classifier,
            write_quality_classifier,
        )
        from qradar_restapi_kafka_datapipeline_spark.operators.text import (
            quality_score_sql,
        )

        w, b = train_quality_classifier(spark, sample_n=400)
        art = str(tmp_path / "model")
        write_quality_classifier(spark, w, b, art)
        scored = {
            r["doc_id"]: r["keep"]
            for r in spark.sql(quality_classifier_sql("spark", art)).collect()
        }
        qs = spark.sql(
            f"SELECT doc_id, {quality_score_sql('text', 'spark')} AS q "
            "FROM documents"
        ).collect()
        train_q = sorted(r["q"] for r in qs if r["doc_id"] < 400)
        med = train_q[len(train_q) // 2]

        def acc(rows):
            hits = [ (r["q"] >= med) == scored[r["doc_id"]] for r in rows ]
            return sum(hits) / len(hits)

        assert acc([r for r in qs if r["doc_id"] < 400]) >= 0.9   # training
        assert acc([r for r in qs if r["doc_id"] >= 400]) >= 0.7  # holdout


def test_dsir_frozen_apply_reproduces_corpus_scores(spark, tables):
    """Scoring the BASE corpus with the frozen selector must reproduce the
    end-to-end dsir_scores values doc-for-doc — the artifact carries
    exactly the statistics the one-shot path derives."""
    import tempfile

    from qradar_restapi_kafka_datapipeline_spark.operators.curation import (
        build_dsir_selector,
        dsir_apply_sql,
        dsir_scores_sql,
    )

    art = tempfile.mkdtemp(prefix="dsir_lam_")
    build_dsir_selector(spark, art)
    applied = {
        r["doc_id"]: r["dsir_score"]
        for r in spark.sql(
            dsir_apply_sql("spark", art, "(SELECT doc_id, text FROM documents)")
        ).collect()
    }
    end_to_end = {
        r["doc_id"]: r["dsir_score"]
        for r in spark.sql(dsir_scores_sql("spark", top_k=10**9)).collect()
    }
    assert end_to_end  # every ranked doc's score matches the frozen-apply
    for d, s in end_to_end.items():
        assert applied[d] == s, d


def test_mix_token_budget_invariants(spark, sf_dir):
    """The budget report's arithmetic: kept <= total per stratum, the
    smallest stratum keeps everything (rate 10000), and kept_docs tracks
    rate_bp/10000 of n_docs within the hash-gate's basis-point tolerance."""
    from qradar_restapi_kafka_datapipeline_spark.operators.curation import (
        mix_token_budget_sql,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    rows = spark.sql(mix_token_budget_sql("spark")).collect()
    assert len(rows) > 1
    smallest = min(rows, key=lambda r: r["n_docs"])
    assert smallest["rate_bp"] == 10000
    for r in rows:
        assert 0 < r["rate_bp"] <= 10000
        assert r["kept_docs"] <= r["n_docs"]
        assert r["kept_tokens"] <= r["n_tokens"]
        # hash gating is uniform: observed keep fraction within ±15pp of
        # the assigned rate even on small strata
        assert abs(r["kept_docs"] / r["n_docs"] - r["rate_bp"] / 10000) < 0.15


def test_weighted_sample_invariants(spark, sf_dir):
    """E-S weighted sampling: deterministic across runs, exactly k rows,
    and token-proportional — the sampled mean token count must exceed the
    corpus mean (long docs are over-drawn per E-S), and the plan must be
    a bounded top-k."""
    from qradar_restapi_kafka_datapipeline_spark.operators.curation import (
        weighted_sample_sql,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    load_tables(spark, sf_dir)
    a = spark.sql(weighted_sample_sql("spark")).collect()
    b = spark.sql(weighted_sample_sql("spark")).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # deterministic
    n_docs = spark.table("documents").count()
    assert len(a) == min(100, n_docs)
    sample_mean = sum(r["n_tok"] for r in a) / len(a)
    corpus_mean = (
        spark.sql(
            "SELECT AVG(size(split(trim(text), '\\\\s+'))) AS m FROM documents"
        ).first()["m"]
    )
    assert sample_mean > corpus_mean * 0.98
    plan = spark.sql(weighted_sample_sql("spark"))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_corpus_drift_js_properties(spark, tables):
    """Round 8: JS divergence invariants — bounded in [0, ln 2], SYMMETRIC
    in the snapshot split, and exactly 0 when the two snapshots have
    identical bigram distributions (a duplicated corpus split by the
    duplicate flag)."""
    import math

    row = spark.sql(C.corpus_drift_js_sql("spark")).first()
    assert row["n_old"] > 0 and row["n_new"] > 0
    assert 0.0 <= row["js_nats"] <= math.log(2) + 1e-6

    flipped = spark.sql(
        C.corpus_drift_js_sql("spark", old_pred="source NOT IN ('src0', 'src1')")
    ).first()
    assert flipped["js_nats"] == row["js_nats"]
    assert (flipped["n_old"], flipped["bigrams_old"]) == (
        row["n_new"], row["bigrams_new"]
    )

    spark.sql(
        "SELECT doc_id, text, source FROM documents "
        "UNION ALL SELECT doc_id + 1000000, text, source FROM documents"
    ).createOrReplaceTempView("__drift_twin")
    same = spark.sql(
        C.corpus_drift_js_sql(
            "spark", old_pred="doc_id < 1000000", source="__drift_twin"
        )
    ).first()
    assert same["js_nats"] == 0.0
    assert same["bigrams_old"] == same["bigrams_new"]


def test_snapshot_diff_exact_counts(spark, tables):
    """Round 8: the versioning diff must classify exactly — the synthetic
    second snapshot removes every 7th doc, edits every (surviving) 11th,
    and re-adds every 13th under a shifted id, so the per-status totals
    are computable from the split predicates alone."""
    from qradar_restapi_kafka_datapipeline_spark.operators.dedup import (
        SNAPSHOT_DIFF_NEW_REL,
        snapshot_diff_sql,
    )

    ids = [r["doc_id"] for r in spark.table("documents").collect()]
    want = {
        "added": sum(1 for i in ids if i % 13 == 0),
        "removed": sum(1 for i in ids if i % 7 == 0),
        "modified": sum(1 for i in ids if i % 7 != 0 and i % 11 == 0),
        "unchanged": sum(1 for i in ids if i % 7 != 0 and i % 11 != 0),
    }
    got = {}
    for r in spark.sql(
        snapshot_diff_sql("spark", "documents", SNAPSHOT_DIFF_NEW_REL)
    ).collect():
        got[r["status"]] = got.get(r["status"], 0) + r["n_docs"]
    assert got == {k: v for k, v in want.items() if v > 0}


def test_exact_k_per_stratum_counts_and_determinism(spark, tables):
    """Round 8: the eval-set constructor keeps EXACTLY min(k, |stratum|)
    docs per stratum, the same set on every run, and a smaller k draws a
    strict PREFIX of a larger k's set (the property that lets eval sets
    grow without resampling history)."""
    k5 = spark.sql(C.exact_k_per_stratum_sql("spark", k=5)).collect()
    sizes = {}
    for r in k5:
        sizes[r["source"]] = sizes.get(r["source"], 0) + 1
    strata = {
        r["source"]: r["n"]
        for r in spark.sql(
            "SELECT source, COUNT(*) AS n FROM documents GROUP BY source"
        ).collect()
    }
    assert sizes == {s: min(5, n) for s, n in strata.items()}
    again = spark.sql(C.exact_k_per_stratum_sql("spark", k=5)).collect()
    key = lambda rows: sorted((r["doc_id"], r["source"], r["rk"]) for r in rows)
    assert key(again) == key(k5)
    k3 = {r["doc_id"] for r in spark.sql(
        C.exact_k_per_stratum_sql("spark", k=3)
    ).collect()}
    assert k3 <= {r["doc_id"] for r in k5}
