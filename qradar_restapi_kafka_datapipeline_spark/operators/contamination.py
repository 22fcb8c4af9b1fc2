"""Cross-split contamination check for training-data pipelines (north-star M6).

Before training, every eval/test document must be screened against the train
split for n-gram overlap — a test doc whose shingles largely appear somewhere
in the train corpus is contaminated and inflates benchmark scores.  (The
reference pipeline has no analog; this extends the engine's dedup family —
reference architecture context: vikramaditya-tatke/qradar-restapi-kafka-datapipeline
``etl.py:16-49`` is a per-event transform with no corpus-level analysis.)

Spark shape (all built-ins, no Python in the row path):

1. split the corpus by a deterministic id predicate (train / test),
2. shingle both sides with the SAME ``_word_shingles`` the dedup family uses
   (one explode + map-side-distinct projection per side),
3. ``left_semi`` join test shingles against the DISTINCT train shingle set —
   an equi-join shuffle-partitioned on the shingle, no cross product,
4. per-test-doc counts → contamination rate.

At 100 TB the train shingle set is the big side; the semi-join hashes both
sides by shingle so each bucket joins locally.  When the test split is small
(the usual case: eval sets are tiny), Catalyst/AQE broadcasts the TEST side's
shingles instead — either orientation avoids a cross product.  For a further
scale lever, replace the exact semi-join with a Bloom filter built over train
shingle hashes (``F.expr("might_contain(...)")``) and accept a bounded false
-positive contamination overcount; the exact join stays the default because
its output is auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.operators.dedup import _word_shingles


def contamination_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    test_mod: int = 5,
) -> DataFrame:
    """Per-test-document train-overlap report.

    Split rule: ``id % test_mod == 0`` → test, else train (deterministic, so
    the DuckDB oracle reproduces it exactly).  Returns one row per test doc:
    ``(doc_id, n_shingles, n_contaminated, contamination_rate)`` where the
    rate is the fraction of the doc's DISTINCT word-``shingle_k``-grams that
    appear in ANY train document.
    """
    test = df.where(F.col(id_col) % test_mod == 0)
    train = df.where(F.col(id_col) % test_mod != 0)
    test_sh = _word_shingles(test, id_col, text_col, shingle_k)
    train_sh = (
        _word_shingles(train, id_col, text_col, shingle_k)
        .select("shingle")
        .distinct()
    )
    counts = test_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        test_sh.join(train_sh, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        counts.join(hits, id_col, "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .withColumn(
            "contamination_rate",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
        .select(id_col, "n_shingles", "n_contaminated", "contamination_rate")
    )


def decontaminate_train(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    test_mod: int = 5,
    max_rate: float = 0.5,
) -> DataFrame:
    """The REMOVAL action behind :func:`contamination_report`, in the
    GPT-3/PaLM direction: drop TRAIN documents whose shingle overlap with
    the eval split exceeds ``max_rate`` (training on eval content inflates
    benchmarks; the eval set itself is fixed, so the train side is what gets
    scrubbed).  Returns the surviving train docs.

    Same join discipline as the report with the sides swapped: the TEST
    shingle set is the DISTINCT small side (eval sets are tiny), so AQE
    broadcasts it into the semi-join against train shingles — one pass over
    the train corpus at any scale.
    """
    train = df.where(F.col(id_col) % test_mod != 0)
    test_sh = (
        _word_shingles(
            df.where(F.col(id_col) % test_mod == 0), id_col, text_col, shingle_k
        )
        .select("shingle")
        .distinct()
    )
    train_sh = _word_shingles(train, id_col, text_col, shingle_k)
    counts = train_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    hits = (
        train_sh.join(test_sh, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__h"))
    )
    flagged = (
        counts.join(hits, id_col)
        .where(F.col("__h") / F.col("__n") > max_rate)
        .select(id_col)
    )
    return train.join(flagged, id_col, "left_anti")


def decontaminate_train_bloom(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    test_mod: int = 5,
    max_rate: float = 0.5,
    m_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """:func:`decontaminate_train` with a broadcast Bloom-filter PREFILTER —
    the 100 TB shape of the same decision, value-identical output.

    The exact path semi-joins EVERY train shingle against the eval shingle
    set: correct, but at corpus scale that join shuffles the full train
    shingle relation (string keys) even though almost none of it overlaps an
    eval set.  Here the eval shingles are folded into an ``m_bits`` Bloom
    bitmap — a SINGLE ROW of ``m_bits/64`` longs (128 KiB at the default
    2^20) built with one aggregation — that Catalyst broadcasts to every
    task.  Train shingles test membership with pure JVM bit expressions
    (``n_hashes`` independent ``xxhash64`` probes), so the non-candidate
    bulk of the corpus is eliminated MAP-SIDE with zero shuffle; only the
    surviving candidates (true hits + the bounded false-positive residue)
    enter the exact semi-join that makes the final answer auditable.

    Bloom false positives are removed by that exact verify and false
    negatives are impossible (every bit of a present shingle is set), so the
    output is hash-identical to :func:`decontaminate_train` — the driver
    gate checks this against the SAME raw-SQL oracle, meaning a hashing or
    bitmap bug fails loudly rather than silently over/under-scrubbing.
    (Reference context: vikramaditya-tatke/qradar-restapi-kafka-datapipeline has no
    corpus analysis — ``etl.py:16-49`` is per-event; this extends the
    engine's training-data family.)
    """
    train = df.where(F.col(id_col) % test_mod != 0)
    test_sh = (
        _word_shingles(
            df.where(F.col(id_col) % test_mod == 0), id_col, text_col, shingle_k
        )
        .select("shingle")
        .distinct()
    )
    # one bit position per (shingle, probe): pos = xxhash64(shingle, i) mod m
    probes = F.explode(
        F.array(*[F.lit(i) for i in range(n_hashes)])
    ).alias("__i")
    positions = test_sh.select("shingle", probes).select(
        F.pmod(F.xxhash64("shingle", "__i"), F.lit(m_bits)).alias("__pos")
    )
    # fold positions into a one-row {word_index -> 64-bit mask} map; the
    # aggregation is distributed (per-word-index bit_or, then one bounded
    # collect of <= m_bits/64 entries into the single broadcast row)
    bitmap = (
        positions.select(
            (F.col("__pos") / 64).cast("int").alias("__w"),
            F.expr("shiftleft(1L, CAST(__pos % 64 AS INT))").alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__m"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("__w", "__m"))).alias("__bloom")
        )
    )
    train_sh = _word_shingles(train, id_col, text_col, shingle_k)
    counts = train_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    bit_checks = [
        "(coalesce(try_element_at(__bloom, CAST(pmod(xxhash64(shingle, "
        f"{i}), {m_bits}) / 64 AS INT)), 0L) & shiftleft(1L, "
        f"CAST(pmod(xxhash64(shingle, {i}), {m_bits}) % 64 AS INT))) != 0"
        for i in range(n_hashes)
    ]
    candidates = (
        train_sh.join(F.broadcast(bitmap))
        .where(F.expr(" AND ".join(bit_checks)))
        .drop("__bloom")
    )
    hits = (
        candidates.join(test_sh, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__h"))
    )
    flagged = (
        counts.join(hits, id_col)
        .where(F.col("__h") / F.col("__n") > max_rate)
        .select(id_col)
    )
    return train.join(flagged, id_col, "left_anti")


def decontaminate_oracle_sql(
    source: str = "documents",
    shingle_k: int = 3,
    test_mod: int = 5,
    max_rate: float = 0.5,
    out_cols: str = "doc_id, source, lang",
) -> str:
    """DuckDB twin of :func:`decontaminate_train` (shared shingle CTE shape
    with :func:`contamination_oracle_sql`, roles swapped)."""
    cols = ", ".join(f"w[i+{j}]" for j in range(shingle_k))
    return f"""
    WITH docs AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM {source}
    ),
    sh AS (
      SELECT DISTINCT doc_id, concat_ws(' ', {cols}) AS shingle
      FROM docs,
        UNNEST(generate_series(1, greatest(len(w) - {shingle_k - 1}, 1))) AS t(i)
    ),
    test_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {test_mod} = 0),
    train AS (SELECT * FROM sh WHERE doc_id % {test_mod} != 0),
    rates AS (
      SELECT doc_id,
             SUM(CASE WHEN shingle IN (SELECT shingle FROM test_sh)
                 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS r
      FROM train GROUP BY doc_id
    )
    SELECT {out_cols} FROM {source}
    WHERE doc_id % {test_mod} != 0
      AND doc_id NOT IN (SELECT doc_id FROM rates WHERE r > {max_rate})
    """


def contamination_oracle_sql(
    source: str = "documents", shingle_k: int = 3, test_mod: int = 5
) -> str:
    """DuckDB oracle: identical split rule + shingle semantics (partial final
    shingle for docs shorter than k words — concat_ws skips NULL elements in
    both engines, matching the dedup family's existing jaccard oracle)."""
    cols = ", ".join(f"w[i+{j}]" for j in range(shingle_k))
    return f"""
    WITH docs AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM {source}
    ),
    sh AS (
      SELECT DISTINCT doc_id, concat_ws(' ', {cols}) AS shingle
      FROM docs,
        UNNEST(generate_series(1, greatest(len(w) - {shingle_k - 1}, 1))) AS t(i)
    ),
    test AS (SELECT * FROM sh WHERE doc_id % {test_mod} = 0),
    train AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {test_mod} != 0),
    counts AS (SELECT doc_id, COUNT(*) AS n_shingles FROM test GROUP BY 1),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_contaminated FROM test
      WHERE shingle IN (SELECT shingle FROM train) GROUP BY 1
    )
    SELECT c.doc_id, c.n_shingles,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           ROUND(COALESCE(h.n_contaminated, 0) * 1.0 / c.n_shingles, 6)
             AS contamination_rate
    FROM counts c LEFT JOIN hits h ON c.doc_id = h.doc_id
    """
