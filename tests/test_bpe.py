"""Corpus-trained BPE tokenizer (operators/bpe.py) — trainer determinism,
greedy merge semantics, longest-match application, unseen-char fallback."""

import duckdb

from qradar_restapi_kafka_datapipeline_spark.operators import bpe as B


def _docs(spark, texts, view="bpe_docs"):
    spark.createDataFrame(
        [(i, t, "src0") for i, t in enumerate(texts)],
        "doc_id BIGINT, text STRING, source STRING",
    ).createOrReplaceTempView(view)
    return view


def test_train_bpe_is_deterministic_and_greedy(spark):
    view = _docs(spark, ["aaab aaab aaab", "aaab ab"])
    t1 = B.train_bpe(spark, source=view, n_merges=3)
    t2 = B.train_bpe(spark, source=view, n_merges=3)
    assert t1 == t2
    # 'aaab' x4 + 'ab' x1: pair counts (a,a)=8, (a,b)=5 -> merge 'aa' first;
    # then greedy re-segmentation of aaab = (aa)(a)(b): pairs (aa,a)=4,
    # (a,b)=4+1 -> tie broken lexicographically: ('a','b') < ('aa','a')
    assert t1[0] == "aa" and "ab" in t1


def test_train_bpe_raises_on_vocab_cap_overflow(spark):
    """VERDICT r4 #6: a corpus with more distinct words than vocab_cap must
    raise — training on a silently-truncated word table would skew merge
    counts and every downstream token budget."""
    import pytest

    view = _docs(spark, ["one two three four five six"])
    with pytest.raises(ValueError, match="vocab_cap"):
        B.train_bpe(spark, source=view, vocab_cap=3)
    # a cap that exactly fits the vocabulary is NOT an overflow
    assert B.train_bpe(spark, source=view, vocab_cap=6) == []


def test_longest_match_wins_and_unseen_chars_fall_back(spark):
    view = _docs(spark, ["abcd", "zq"])
    # hand vocab: both 'ab' and 'abc' known -> 'abcd' must take 'abc' first
    out = {
        r["doc_id"]: r
        for r in B.bpe_doc_tokens(spark, ["ab", "abc"], source=view).collect()
    }
    assert out[0]["n_bpe_tokens"] == 2  # abc|d
    assert out[1]["n_bpe_tokens"] == 2  # z|q (no vocab match: char fallback)
    assert out[0]["n_words"] == 1 and out[1]["n_words"] == 1


def test_bpe_oracle_matches_engine_on_crafted_corpus(spark, tmp_path):
    """The DuckDB recursive-CTE application must reproduce the Spark fold
    exactly on a corpus with runs, repeats, and an empty document."""
    texts = ["aaaa aab", "", "the the theme", "x" * 40]
    view = _docs(spark, texts)
    tokens = B.train_bpe(spark, source=view, n_merges=6)
    path = str(tmp_path / "vocab")
    B.write_bpe_vocab(spark, tokens, path)
    sdf = B.bpe_doc_tokens(spark, tokens, source=view).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW bpe_docs AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}', 'src0')" for i, t in enumerate(texts)
        )
        + ") v(doc_id, text, source)"
    )
    ddf = con.execute(B.bpe_doc_tokens_oracle_sql(path, source="bpe_docs")).df()
    cols = sorted(sdf.columns)
    s = sorted("|".join(map(str, r)) for r in sdf[cols].itertuples(index=False, name=None))
    d = sorted("|".join(map(str, r)) for r in ddf[cols].itertuples(index=False, name=None))
    assert s == d
    # the empty doc contributes a (0, 0, md5('')) row on both engines
    empty = sdf[sdf.doc_id == 1].iloc[0]
    assert empty["n_words"] == 0 and empty["n_bpe_tokens"] == 0


def test_tokenization_is_lossless_per_word(spark, tables):
    """Longest-match invariant: the concatenation of a word's tokens IS the
    word — no character dropped, duplicated, or reordered, for every
    distinct word in the real corpus."""
    from pyspark.sql import functions as F

    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        token_positions_sql,
    )

    tokens = B.train_bpe(spark)
    words = (
        spark.sql(token_positions_sql("spark", "documents"))
        .where("word != ''")
        .select("word")
        .distinct()
    )
    words.createOrReplaceTempView("__bpe_words_rt")
    from qradar_restapi_kafka_datapipeline_spark.operators.bpe import _word_steps

    steps = _word_steps(spark, tokens, spark.table("__bpe_words_rt"))
    arr = steps.groupBy("word").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(p, step))), x -> x.step)"
        ).alias("steps")
    )
    rt = arr.select(
        "word",
        F.expr(
            """
            aggregate(sequence(1, size(steps)),
                      named_struct('p', 1, 's', ''),
                      (acc, i) -> IF(i = acc.p,
                        named_struct('p', acc.p + element_at(steps, i),
                          's', concat(acc.s, substr(word, i, element_at(steps, i)))),
                        acc)).s
            """
        ).alias("rejoined"),
    )
    bad = rt.where(F.col("word") != F.col("rejoined")).count()
    assert bad == 0
