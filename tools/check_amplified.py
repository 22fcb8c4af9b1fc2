#!/usr/bin/env python3
"""Amplified-scale VALUE check (VERDICT r3 #4) — the gate's oracle at ≥16×.

``scale_curve.py`` measures timings at amplified volume; this runs the
actual DuckDB oracle comparison there for the accumulation-sensitive
families — window chains (LAG/sessionize, plain AND bucketed twins),
variance/z-score (subtractive float cancellation), MinHash sketches
(saturation needs volume), hashed-cosine postings (BIGINT dot products),
BPE token counts, and the summing rollup — so value drift that only
appears with volume (accumulation order, sketch saturation, overflow)
cannot hide below the sf0.1 gate scale.

    python3 tools/check_amplified.py [K] [--skew P] [name_prefix ...]  # K=16

``--skew P`` reassigns a deterministic P% of all events to ONE hot user
before the comparison (same transform both engines see), so the window
family's oracle runs in the straggler regime the skew study timed — the
64×/50% configuration puts ~3M rows on a single key, past the ~1M-row
task-sort budget where the bucketed twins earn their keep (VERDICT r4 #5).

One JSON-ish OK/FAIL line per entry, ALL OK summary last; record the run
in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from qradar_restapi_kafka_datapipeline_spark.engine import get_spark  # noqa: E402
from qradar_restapi_kafka_datapipeline_spark.sources.registry import TABLES  # noqa: E402
from tools.check_correctness import value_hash  # noqa: E402
from tools.scale_curve import amplify  # noqa: E402

#: Accumulation-sensitive entries — families where more volume changes the
#: numeric regime, not just the row count.  Value is the entry's K CAP.
#: Round 8 removed every sub-16 cap: the old 4x limits were DuckDB's CTE
#: INLINING re-running each oracle's upstream pipeline once per consumer
#: (not true quadratic cost) — with the hot CTEs pinned AS MATERIALIZED
#: the whole document-similarity family passes at 16x (funnel 27 s,
#: minhash 179 s, clusters 251 s, prefix pairs 875 s).
AMPLIFIED_ENTRIES: dict[str, int | None] = {
    "summing_rollup_hourly": None,
    "event_rate_anomaly": None,
    "event_gaps_lag": None,
    "event_gaps_lag_bucketed": None,
    "event_transition_matrix": None,
    "event_transition_matrix_bucketed": None,
    "beaconing_score": None,
    "beaconing_score_bucketed": None,
    "sessionize_events": None,
    # round 8: windowFunnel — anchor chains at k× event volume (and the
    # skew runs put the hot user's whole journey in one window partition)
    "window_funnel_conversion": None,
    # round 9: the strict modes add a segmentation window pass — foreign-
    # event resets (strict_order) and consecutive-dup breaks (strict_dedup)
    # at k× volume and under the hot-user skew regime
    "window_funnel_strict_order": None,
    "window_funnel_strict_dedup": None,
    "window_funnel_strict_increase": None,
    # round 9: hysteresis episodes — relative thresholds at k× rates (the
    # integer mean-comparison must stay exact as totals grow k²-ish)
    "hysteresis_alert_episodes": None,
    # round 9: path trigrams — LEAD chains at k× volume and under the
    # hot-user skew regime (one user's giant ordered stream)
    "event_path_trigrams": None,
    # round 10: the hot-user-safe twins — the bucketed decompositions must
    # stay hash-equal to the PLAIN DuckDB oracles exactly in the regime
    # they exist for (k× volume, 50% single-user skew); the perf win is
    # measured separately (DESIGN.md round-10 skew table)
    "window_funnel_bucketed": None,
    "window_funnel_latency": None,
    "event_path_trigrams_bucketed": None,
    # round 9: first-seen cohorts at k× the (user, day) population — the
    # DataFrame chain's persisted distinct relation vs the 3-CTE oracle
    "cohort_retention_exact": None,
    # round 9: the cluster form of perceptual-hash dedup — distinct-hash
    # population is bounded by texture diversity, so output stays small
    # at k× docs while member counts grow k×; the doc-level pair entry is
    # deliberately NOT amplified (its output is quadratic in duplicate-
    # class size by design — the cluster form is the scale path)
    "dedup_image_phash_clusters": None,
    # round 11: the audio sibling — distinct-fingerprint population is
    # bounded by content diversity (the amplified copies' interleaved
    # tags perturb sampled word positions, so cross-copy fingerprints
    # fall outside the near band and the output grows ~linearly)
    "dedup_audio_fingerprint_clusters": None,
    "sessionize_events_bucketed": None,
    # round 10: streamed hysteresis — per-epoch rate parts SUM-merged at
    # read must equal the one-shot episode derivation at k× daily rates
    "streaming_hysteresis_parity": None,
    # round 10: container frame sampling — the seek/decode kernel over k×
    # the payload population (mapInPandas at volume), closed-form oracle
    "multimodal_video_frames": None,
    # round 10: refined IVF-PQ serve — the oracle replays coarse assign +
    # probes + codes + LUT + ADC + exact-cosine refine at k× vectors
    "knn_ivfpq_refined": None,
    # round 11: the √n auto-geometry build→serve→refine path — nlist is
    # derived from the AMPLIFIED corpus size (auto_nlist picks √(k·n)
    # lists), so this is the one row where the 100-TB default geometry
    # itself runs at volume; the oracle replays the whole pipeline from
    # the persisted artifacts, adapting to whatever geometry was chosen.
    # 16 = the one-statement oracle's memory bound (its n×√n-list assign
    # and n×m×ksub encode windows OOM'd a 64x run, 60 GiB spill budget);
    # above it the sharded per-vector-independent recompute below runs
    "knn_ivfpq_auto_refined": 16,
    # round 11: streamed per-epoch vector appends — the emitted-keys
    # oracle re-derives every served row's cosine/rank over the
    # amplified corpus, so a lost or double-folded epoch surfaces as a
    # missing/extra neighbor at volume
    "streaming_ivf_append_parity": None,
    # round 11: tombstone deletes — the exclude-predicate oracle must
    # hold at volume (a leaked deleted id fails the row-count match)
    "knn_ivf_deleted": None,
    # round 11: VERSION AS OF — the historical snapshot must equal the
    # raw-events recomputation of the first two epochs at k× volume
    # (a stale mapping or leaked epoch-2 row shifts a summed measure)
    "rollup_time_travel": None,
    "percentile_values": None,
    "text_bpe_tokenize": None,
    # round 9: fertility strata — same emitted-vocab contract, per-lang
    # exact sums at k× the word population
    "text_bpe_fertility_by_lang": None,
    "aql_auto_rollup_routed": None,  # navigator vs raw-events oracle at volume
    # round 6: sketch saturation regimes only volume can reach — CM cell
    # collisions at k× the user population, HLL leaving linear counting
    # for the raw-estimate branch, histogram cumulative ranks at k× counts;
    # merge parities re-prove distributed-build ≡ whole at volume
    "sketch_cm_heavy_hitters": None,
    "sketch_cm_merge_parity": None,
    "sketch_hll_distinct": None,
    "sketch_hll_merge_parity": None,
    "sketch_hll_daily_cube": None,
    "sketch_histogram_quantiles": None,
    # round 7: HDR rank sketch — cumulative ranks and shift-bucket
    # occupancy at k× counts; merge parity re-proven at volume
    "sketch_rank_quantiles": None,
    "sketch_rank_merge_parity": None,
    "sketch_rank_grouped": None,
    "sketch_rank_daily_cube": None,
    # round 7: KMV saturation (distinct keys >> k) and union-sketch overlap
    "sketch_kmv_distinct": None,
    "sketch_kmv_merge_parity": None,
    "sketch_kmv_jaccard": None,
    # round 7: CM inner product (collision cross-terms need volume) and the
    # cube-served rolling distinct at k× the register occupancy
    "sketch_cm_join_cardinality": None,
    "sketch_hll_rolling_distinct": None,
    "sketch_kmv_retention": None,
    # round 9: first-seen cohorts from the cube — 16x pushes per-day
    # distinct users past k=256, leaving the sketch-complete regime the
    # small SFs sit in; the θ-sample arithmetic must stay hash-equal
    "sketch_kmv_cohort": None,
    # round 7: E-S priorities at k× the candidate population (rank
    # boundaries shift with volume; ulp-rounding must hold at any k)
    "sample_weighted_tokens": None,
    # round 7 (VERDICT r6 #5): DSIR's BIGINT micro-unit log-ratio sums and
    # the composed funnel's stage handoffs at k× the document volume; the
    # funnel's DuckDB oracle replays all four stages as ONE nested
    # statement with no persisted intermediates, so it gets the bounded
    # amplification of its document-similarity peers
    "curate_dsir_topk": None,
    # round 8: JS drift — integer ln-ratio micro-units at k× the bigram
    # totals (the products inside LN args grow k²; exactness must hold)
    "corpus_drift_js": None,
    # round 8: versioning diff — full-outer classification at k× rows
    "snapshot_diff_report": None,
    # round 8: incrementally-maintained indexes replayed at k× volume —
    # per-epoch tf parts fold 16x the terms, serving must still equal the
    # one-shot oracle (df/N/avgdl shift with volume)
    "streaming_text_index_parity": None,
    "streaming_chunk_index_parity": 16,  # chunk oracle is the 64x bound
    # round 12: the takedown twins — tombstone-streamed deletes must
    # leave BM25's shrunken df/N/avgdl (and the chunk postings'
    # df-damping) hash-equal to a rebuild over the remaining docs at
    # k× volume; the chunk oracle shares its family's one-statement
    # memory bound
    "text_index_delete_parity": None,
    "chunk_index_delete_parity": 16,
    # round 12: streamed codes appends — the full artifact-replay
    # oracle (assign + encode + LUT + ADC + refine) over the amplified
    # corpus must equal the two-tree streamed serve.  16 = the
    # one-statement replay's memory bound (same n×lists assign +
    # n×m×ksub encode windows as knn_ivfpq_auto_refined); above it the
    # sharded per-vector replay runs (round 13, VERDICT r12 #4)
    "streaming_ivfpq_append_parity": 16,
    # round 12: the composed streamed-view navigator path vs the
    # raw-events oracle at volume (a lost/doubled epoch shifts a sum)
    "streaming_globalview_routed": None,
    "curate_dsir_apply": None,
    "streaming_dsir_apply_parity": None,
    "pipeline_corpus_funnel": 16,  # was OOM pre-materialization
    "dedup_minhash_lsh": 16,
    # round 6: the sum-compare fixpoint rewrite (labels only decrease →
    # unchanged SUM(label) == converged) value-checked on a 4× pair graph
    # against the recursive-closure oracle
    "dedup_clusters": 16,
    "text_semantic_pairs_hashed_prefix": 16,
    # round 7: chunk reassembly at volume (string_agg vs sort_array paths);
    # r8 (VERDICT r7 #4): raised 4x -> 16x to match the sketch family's
    # evidence bar — both oracles are LINEAR in corpus tokens (windowing +
    # postings; no all-pairs term), unlike the capped similarity peers
    "text_chunk_windows": None,  # 64x green (36 s)
    # chunk retrieval: BIGINT dot growth over amplified chunk postings.
    # The one-statement oracle is capped at 16x (it exceeded 100 GiB RAM
    # + the 60 GiB spill budget at 64x); ABOVE that cap the runner swaps
    # in the SHARDED recompute below (VERDICT r8 #6) — parquet-staged tf
    # + global df filter + per-shard top-k — which is value-identical
    # and bounded by the largest shard, so the 64x claim is checkable.
    "text_chunk_knn": 16,
}


def _chunk_knn_sharded_oracle(
    con,
    shards: int = 16,
    query_doc: int = 0,
    k: int = 10,
    size: int = 64,
    stride: int = 48,
    dim: int = 1024,
):
    """Sharded DuckDB recompute of ``text_chunk_knn`` (round 9): the
    one-statement oracle materializes the WHOLE chunk-postings relation
    (O(corpus tokens) in RAM) — at 64x that is the bound, not the engine.
    This form stages the two tf relations to parquet ONCE (each a single
    streaming pipeline DuckDB can spill), derives the GLOBAL df filters
    from the staged files (a shard-restricted tf damped by shard-local df
    would diverge from the corpus-wide build — the keep_rel hook exists
    for exactly this), then scores chunks shard-by-shard (doc_id residue
    classes) keeping only each shard's top-k; the global top-k is the
    merge of shard top-ks under the same (cos, doc, start) order.  Memory
    is bounded by ONE shard's postings.  Top-k correctness: every global
    winner is its own shard's winner too, and the tie order is total."""
    import pandas as pd

    from qradar_restapi_kafka_datapipeline_spark.operators import text as T

    from qradar_restapi_kafka_datapipeline_spark.operators.sketches import (
        _seeds,
    )

    stage = tempfile.mkdtemp(prefix="amp_chunkknn_stage_")
    # ADVICE r9: the staging dir must not leak on the failure path —
    # this oracle exists FOR the OOM/spill regime, and tens of GB of
    # staged token/tf parquet in /tmp on a shared host is the cost.
    try:
        # Stage 1: token positions — a pure streaming UNNEST, no windows, no
        # joins.  Everything downstream reads THIS parquet, so the tokenize
        # pipeline never gets duplicated into both sides of a self-join (the
        # shape whose simultaneous window cascades OOM'd the direct
        # bigram_tf_sql-over-chunks staging at 64x).
        t0 = time.time()
        con.execute(
            f"COPY ({T.token_positions_sql('duckdb', 'documents')}) "
            f"TO '{stage}/dtok.parquet' (FORMAT PARQUET)"
        )
        print(f"  chunk_knn staged tokens [{time.time()-t0:.0f}s]", flush=True)
        tok = f"read_parquet('{stage}/dtok.parquet')"
        bg = (
            f"SELECT a.doc_id, a.pos, CONCAT(a.word, ' ', b.word) AS feat "
            f"FROM {tok} a JOIN {tok} b "
            f"ON a.doc_id = b.doc_id AND b.pos = a.pos + 1"
        )
        # Stage 2: doc-level bigram tf (the query-vector source).
        t0 = time.time()
        con.execute(
            f"COPY (SELECT doc_id, feat, CAST(COUNT(*) AS BIGINT) AS c "
            f"FROM ({bg}) g GROUP BY doc_id, feat) "
            f"TO '{stage}/dtf.parquet' (FORMAT PARQUET)"
        )
        print(f"  chunk_knn staged doc tf [{time.time()-t0:.0f}s]", flush=True)
        # Stage 3: chunk-level bigram tf DIRECTLY from doc token positions —
        # the bigram at global positions (p, p+1) belongs to sliding window
        # cs iff cs ≤ p and p + 1 ≤ cs + size - 1, and valid starts are the
        # same constant-fan-out seed set chunk_documents_sql uses.  Chunk
        # text reassembly round-trips tokenization exactly (words joined by
        # one space, re-split on \\s+), so this tf is value-identical to
        # tokenizing the reassembled chunks — proven by the sharded ==
        # one-shot equality test at sf0.01 AND by the 64x hash check against
        # the Spark side, which takes the reassembly path.
        kk_fan = -(-size // stride)
        cs = f"((g.pos // {stride}) - s.i) * {stride}"
        guard = (
            f"CASE WHEN cs < {T.CHUNK_ID_MULT} THEN 0 ELSE "
            f"CAST(error('chunk_start overflows composite chunk id radix') "
            f"AS BIGINT) END"
        )
        t0 = time.time()
        con.execute(
            f"COPY (SELECT doc_id * {T.CHUNK_ID_MULT} + cs + {guard} AS doc_id, "
            f"feat, CAST(COUNT(*) AS BIGINT) AS c FROM ("
            f"SELECT g.doc_id, {cs} AS cs, g.feat "
            f"FROM ({bg}) g CROSS JOIN ({_seeds('duckdb', kk_fan)}) s "
            f"WHERE ((g.pos // {stride}) - s.i) >= 0 "
            f"AND g.pos - {cs} <= {size - 2}) w "
            f"GROUP BY doc_id, cs, feat) "
            f"TO '{stage}/ctf.parquet' (FORMAT PARQUET)"
        )
        print(f"  chunk_knn staged chunk tf [{time.time()-t0:.0f}s]", flush=True)
        for nm in ("ctf", "dtf"):
            t0 = time.time()
            # tf is grouped by (doc_id, feat), so per-feat document frequency
            # is COUNT(*), not COUNT(DISTINCT doc_id) — the distinct aggregate
            # is the one shape DuckDB 1.0 cannot spill (it OOM'd the first
            # 64x staging pass); the scalar chunk count hash-distincts fine.
            con.execute(
                f"COPY (SELECT feat FROM read_parquet('{stage}/{nm}.parquet') "
                f"GROUP BY feat HAVING COUNT(*) * 2 <= "
                f"(SELECT COUNT(DISTINCT doc_id) "
                f"FROM read_parquet('{stage}/{nm}.parquet'))) "
                f"TO '{stage}/{nm}_keep.parquet' (FORMAT PARQUET)"
            )
            print(f"  chunk_knn staged {nm} keep [{time.time()-t0:.0f}s]",
                  flush=True)
        qp_sql = T.hashed_embedding_postings_sql(
            "duckdb",
            dim,
            tf_rel=(
                f"(SELECT doc_id, feat, c FROM read_parquet('{stage}/dtf.parquet')"
                f" WHERE doc_id = {query_doc})"
            ),
            keep_rel=f"read_parquet('{stage}/dtf_keep.parquet')",
        )
        con.execute(
            f"COPY (SELECT bucket, w FROM ({qp_sql}) q) "
            f"TO '{stage}/qp.parquet' (FORMAT PARQUET)"
        )
        parts = []
        for s in range(shards):
            post_sql = T.hashed_embedding_postings_sql(
                "duckdb",
                dim,
                tf_rel=(
                    f"(SELECT doc_id, feat, c "
                    f"FROM read_parquet('{stage}/ctf.parquet') "
                    f"WHERE (doc_id // {T.CHUNK_ID_MULT}) % {shards} = {s})"
                ),
                keep_rel=f"read_parquet('{stage}/ctf_keep.parquet')",
            )
            parts.append(con.execute(f"""
            WITH post AS MATERIALIZED ({post_sql}),
            qp AS (SELECT bucket, w FROM read_parquet('{stage}/qp.parquet')),
            qn AS (SELECT CAST(SUM(w * w) AS BIGINT) AS n2 FROM qp),
            cn AS (
              SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
              FROM post GROUP BY doc_id
            ),
            dots AS (
              SELECT p.doc_id, CAST(SUM(p.w * q.w) AS BIGINT) AS dot
              FROM post p JOIN qp q ON q.bucket = p.bucket
              GROUP BY p.doc_id
            )
            SELECT CAST(d.doc_id // {T.CHUNK_ID_MULT} AS BIGINT) AS chunk_doc_id,
                   CAST(d.doc_id % {T.CHUNK_ID_MULT} AS BIGINT) AS chunk_start,
                   ROUND(CAST(d.dot AS DOUBLE)
                         / SQRT(CAST(cn.n2 AS DOUBLE) * CAST(qn.n2 AS DOUBLE))
                         + 1e-9, 6) AS cos
            FROM dots d
            JOIN cn ON cn.doc_id = d.doc_id
            CROSS JOIN qn
            WHERE d.dot > 0
            ORDER BY cos DESC, chunk_doc_id ASC, chunk_start ASC
            LIMIT {k}
            """).df())
            print(f"  chunk_knn shard {s + 1}/{shards} scored", flush=True)
        merged = (
            pd.concat(parts, ignore_index=True)
            .sort_values(
                ["cos", "chunk_doc_id", "chunk_start"],
                ascending=[False, True, True],
            )
            .head(k)
            .reset_index(drop=True)
        )
        return merged
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _ivfpq_sharded_oracle(
    con,
    shards: int = 16,
    dim: int = 64,
    m: int = 16,
    nprobe: int = 4,
    query_max: int = 3,
    k: int = 3,
    refine_k: int = 60,
    emit_name: str = "ivfpq_auto",
):
    """Sharded DuckDB replay of ``knn_ivfpq_auto_refined`` (round 12,
    VERDICT r11 #6): the one-statement oracle's corpus stages — coarse
    assignment (n × √n-auto-lists dot products + a per-vector
    ROW_NUMBER) and PQ encode (n × m × ksub distances + a per-(vec, mi)
    ROW_NUMBER) — OOM'd a 64× run even with a 60 GiB spill budget (the
    window + list_transform intermediates are the unspillable part).
    Both stages are PER-VECTOR independent, so they shard by vec_id
    residue with NO global-statistics hook needed (unlike the df-damped
    chunk postings): each shard is one bounded COPY pipeline staged to
    parquet.  The serving stages (probes for query_max vectors, LUT,
    ADC over probed lists only, exact-cosine refine of the bounded
    shortlist) are cheap and run as one final statement over the staged
    relations — the SAME shared rounded/tie-broken SQL the one-statement
    oracle uses, so the result is value-identical to it wherever both
    can run (pinned by the 16× row, which still uses the one-statement
    form).

    ``emit_name`` (round 13, VERDICT r12 #4): the per-vector-independent
    shape is artifact-agnostic, so the SAME sharded replay serves every
    IVF-PQ-artifact entry — ``ivfpq_auto`` (the √n auto-geometry build)
    and ``ivfpq_stream`` (the streamed-codes append entry, whose frozen
    quantizer/codebooks make one-shot replay ≡ the two-tree streamed
    serve by the per-row-function argument its docstring pins)."""
    import importlib

    eq = importlib.import_module(
        "qradar_restapi_kafka_datapipeline_spark.entry_queries"
    )
    from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
        _ivfpq_refine_sql,
        _vec_rel_sql,
        ivf_assign_sql,
        pq_codes_sql,
        pq_lut_sql,
    )

    cent = f"{eq._emit_dir(emit_name)}/index/centroids"
    cb = f"{eq._emit_dir(emit_name)}/index/codebooks"
    stage = tempfile.mkdtemp(prefix=f"amp_{emit_name}_stage_")
    try:
        for s in range(shards):
            shard_src = (
                f"(SELECT * FROM embeddings "
                f"WHERE vec_id % {shards} = {s}) es"
            )
            t0 = time.time()
            con.execute(
                f"COPY (SELECT vec_id, list_id FROM "
                f"({ivf_assign_sql('duckdb', cent, dim, 1, shard_src)}) a) "
                f"TO '{stage}/assign_{s}.parquet' (FORMAT PARQUET)"
            )
            con.execute(
                f"COPY ({pq_codes_sql('duckdb', cb, m, dim // m, shard_src)}) "
                f"TO '{stage}/codes_{s}.parquet' (FORMAT PARQUET)"
            )
            print(f"  ivfpq_auto staged shard {s + 1}/{shards} "
                  f"[{time.time()-t0:.0f}s]", flush=True)
        q_src = f"(SELECT * FROM embeddings WHERE vec_id < {query_max}) qs"
        probes = (
            f"SELECT vec_id AS q_id, list_id FROM "
            f"({ivf_assign_sql('duckdb', cent, dim, nprobe, q_src)}) pa"
        )
        lut = pq_lut_sql("duckdb", cb, m, dim // m, query_max, q_src)
        codes = (
            f"SELECT c.vec_id, c.mi, c.j, a.list_id "
            f"FROM read_parquet('{stage}/codes_*.parquet') c "
            f"JOIN read_parquet('{stage}/assign_*.parquet') a "
            f"ON a.vec_id = c.vec_id"
        )
        return con.execute(
            _ivfpq_refine_sql(
                "duckdb", codes, probes, lut,
                _vec_rel_sql("duckdb", "embeddings"),
                refine_k, k, dim,
            )
        ).df()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


#: Entries whose one-statement oracle cannot run at high amplification:
#: above the AMPLIFIED_ENTRIES cap the runner uses this bounded-memory
#: recompute instead of the capped SQL (and the cap no longer limits k).
AMPLIFIED_ORACLE_FNS = {
    "text_chunk_knn": _chunk_knn_sharded_oracle,
    "knn_ivfpq_auto_refined": _ivfpq_sharded_oracle,
    "streaming_ivfpq_append_parity": (
        lambda con: _ivfpq_sharded_oracle(con, emit_name="ivfpq_stream")
    ),
}


def main() -> int:
    args = sys.argv[1:]
    skew_pct = None
    if "--skew" in args:
        i = args.index("--skew")
        skew_pct = int(args[i + 1])
        del args[i : i + 2]
    k = int(args[0]) if args else 16
    prefixes = tuple(args[1:])
    plan: dict[int, list[str]] = {}
    for n, cap in AMPLIFIED_ENTRIES.items():
        if prefixes and not n.startswith(prefixes):
            continue
        # a sharded-oracle entry runs at the FULL requested k — its cap
        # only marks where the one-statement SQL stops being usable
        eff = k if n in AMPLIFIED_ORACLE_FNS else (min(k, cap) if cap else k)
        plan.setdefault(eff, []).append(n)

    spark = get_spark(app_name="check-amplified")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = n_entries = 0
    for kk, names in sorted(plan.items(), reverse=True):
        base = tempfile.mkdtemp(prefix=f"amp_check_{kk}x_")
        t0 = time.time()
        amplify(spark, base, kk, skew_pct)
        print(
            f"amplified sf0.1 by {kk}x"
            + (f" at {skew_pct}% hot-user skew" if skew_pct else "")
            + f" in {time.time()-t0:.0f}s",
            flush=True,
        )
        con = duckdb.connect()
        # an in-memory connection has NO temp_directory → zero spill
        # capacity: the 16x chunk-postings oracle OOMs even with RAM to
        # spare.  Point it at disk so big oracles go out-of-core instead.
        spill = tempfile.mkdtemp(prefix="amp_duck_spill_")
        con.execute(f"SET temp_directory='{spill}'")
        con.execute("SET max_temp_directory_size='60GiB'")
        for t in TABLES:
            path = f"{base}/{t}.parquet"
            if os.path.isdir(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'")
            elif os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        for name in names:
            n_entries += 1
            t0 = time.time()
            try:
                sdf = qs[name](spark, base).toPandas()
            except Exception as e:
                print(f"FAIL  {name} @{kk}x: spark error {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                failures += 1
                continue
            cap = AMPLIFIED_ENTRIES.get(name)
            use_sharded = (
                name in AMPLIFIED_ORACLE_FNS and cap is not None and kk > cap
            )
            try:
                if use_sharded:
                    ddf = AMPLIFIED_ORACLE_FNS[name](con)
                else:
                    ddf = con.execute(oracles[name]).df()
            except Exception as e:
                print(f"FAIL  {name} @{kk}x: oracle error {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                failures += 1
                continue
            sc, sh, scols = value_hash(sdf)
            dc, dh, dcols = value_hash(ddf)
            if (scols == dcols) and (sc == dc) and (sh == dh):
                print(f"OK    {name} @{kk}x: {sc} rows hash={sh} "
                      f"[{time.time()-t0:.1f}s]", flush=True)
                continue
            failures += 1
            print(f"FAIL  {name} @{kk}x: rows {sc}/{dc} hash {sh}/{dh} "
                  f"cols_match={scols == dcols} [{time.time()-t0:.1f}s]",
                  flush=True)
            if scols == dcols:
                srows = sorted("|".join(map(str, r)) for r in
                               sdf[scols].itertuples(index=False, name=None))
                drows = sorted("|".join(map(str, r)) for r in
                               ddf[dcols].itertuples(index=False, name=None))
                for a, b in zip(srows, drows):
                    if a != b:
                        print(f"      spark: {a[:180]}\n      duck : {b[:180]}",
                              flush=True)
                        break
        con.close()
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(spill, ignore_errors=True)
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({n_entries} amplified entries, k={k})", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
