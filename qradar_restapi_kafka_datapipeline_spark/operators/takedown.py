"""One-call multi-index takedown (round 13, VERDICT r12 #1).

A real GDPR / opt-out / DMCA event is ONE id set that must reach EVERY
maintained artifact — before this verb a user strung six delete calls
together by hand (``examples/takedown_lifecycle.py`` choreographed it
manually).  :func:`takedown` fans a single id relation across a registered
catalog of maintained indexes in one call.

Design, and why replay is trivially safe:

- Every per-index delete in this engine is an IDEMPOTENT tombstone append
  (``delete_from_text_index`` / ``delete_from_hybrid_index`` /
  ``delete_from_ivf_index`` — text.py:1290,1787, similarity.py:990): the
  log is append-only, every reader collapses it with DISTINCT, and no
  index structure is rewritten at delete time.  A takedown that crashes
  mid-fan-out therefore needs NO undo or journal: re-running the same
  call re-appends (duplicate rows collapse) and completes the indexes the
  crash skipped.  O(|ids|) per index regardless of index size.
- The doc↔vec id mapping is explicit: indexes declare their id column
  (``doc_id`` for the text-side artifacts, ``vec_id`` for the vector
  indexes); the one incoming id set is renamed per index (the identity
  doc_id == vec_id mapping the testdata uses), or routed through an
  ``id_map`` relation when the deployment keys vectors differently.
- Ids absent from an index are no-ops by anti-join semantics — the verb
  never needs to know which indexes actually contain a given document.

Masking vs physical drop stays per-index policy: after ``takedown`` every
serve EXCLUDES the ids (broadcast anti-join over the distinct tombstones);
the existing per-index compaction verbs (``compact_text_index``,
``compact_hybrid_index``, ``compact_ivf_index``, ``compact_ivfpq_index``)
drop rows physically on the operator's maintenance schedule.

Reference parity: the reference pipeline (a 996-LoC requests/ijson ETL)
has no index lifecycle; this is north-star functionality for the
large-scale training-data pipeline the engine targets.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

#: kinds whose tombstone log lives flat at ``{path}/tombstones`` keyed by
#: the index's id column
_FLAT_KINDS = {
    "text": "doc_id",
    "hybrid": "doc_id",
    "ivf": "vec_id",
    "ivfpq": "vec_id",
}


@dataclass(frozen=True)
class RegisteredIndex:
    """One maintained artifact the takedown fan-out must reach.

    ``kind``: ``text`` (persisted hashed-postings index,
    :func:`...text.build_text_index`), ``hybrid``
    (:func:`...text.build_hybrid_text_index`), ``ivf`` / ``ivfpq``
    (:func:`...similarity.build_ivf_index` /
    :func:`...similarity.build_ivfpq_index`), or ``parts`` — a
    per-epoch tombstone-parts tree in the streamed-index convention
    (:func:`...text._stream_delete_parts` layout, read by the
    bm25/chunk/phash streamed serves), where ``path`` is the del-parts
    dir itself.
    """

    name: str
    kind: str
    path: str


def _next_epoch(spark, parts: str) -> int:
    """1 + the highest existing ``epoch=N`` part (0 for a fresh tree)."""
    import os

    try:
        return 1 + max(
            (int(d.split("=", 1)[1]) for d in os.listdir(parts)
             if d.startswith("epoch=")),
            default=-1,
        )
    except FileNotFoundError:
        return 0


def takedown(
    spark,
    ids,
    indexes: list[RegisteredIndex],
    id_map=None,
    _crash_after: int | None = None,
) -> dict[str, int]:
    """Fan ONE ``(doc_id)`` id relation across every registered index.

    ``ids``: a DataFrame with a ``doc_id`` column (the takedown batch —
    bounded in practice; never collected here).  ``id_map``: optional
    ``(doc_id, vec_id)`` relation for deployments where vectors are not
    keyed by document id — vector-index deletes route through it
    (broadcast join, ids-sized); without it the identity mapping
    ``vec_id = doc_id`` applies.  Returns ``{index_name: n_ids}``.

    Replay: idempotent end to end — each step is an append-only
    tombstone write that every serve collapses with DISTINCT, so after
    a crash at ANY point (``_crash_after`` injects one after the Nth
    index for the pytest) re-running the identical call converges to
    the same served state everywhere.
    """
    dedup = ids.select("doc_id").distinct()
    n = dedup.count()
    vec_ids = None
    report: dict[str, int] = {}
    for i, ix in enumerate(indexes):
        if ix.kind in ("ivf", "ivfpq"):
            if vec_ids is None:
                if id_map is not None:
                    vec_ids = (
                        id_map.join(F.broadcast(dedup), "doc_id")
                        .select("vec_id").distinct()
                    )
                else:
                    vec_ids = dedup.select(
                        F.col("doc_id").alias("vec_id")
                    )
            vec_ids.write.mode("append").parquet(f"{ix.path}/tombstones")
        elif ix.kind in ("text", "hybrid"):
            dedup.write.mode("append").parquet(f"{ix.path}/tombstones")
        elif ix.kind == "parts":
            # the streamed-serve tombstone-parts convention: land one new
            # immutable epoch part; readers SELECT DISTINCT doc_id over
            # the tree, so a replayed call's extra part collapses away
            epoch = _next_epoch(spark, ix.path)
            dedup.write.mode("overwrite").parquet(
                f"{ix.path}/epoch={epoch}"
            )
        else:
            raise ValueError(
                f"takedown: unknown index kind {ix.kind!r} for {ix.name!r}"
            )
        report[ix.name] = n
        if _crash_after is not None and i == _crash_after:
            raise RuntimeError(
                f"injected crash after index {ix.name!r} (replay test)"
            )
    return report
