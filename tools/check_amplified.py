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

    python3 tools/check_amplified.py [K] [name_prefix ...]   # default K=16

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
#: numeric regime, not just the row count.
AMPLIFIED_ENTRIES = (
    "summing_rollup_hourly",
    "event_rate_anomaly",
    "event_gaps_lag",
    "event_gaps_lag_bucketed",
    "event_transition_matrix",
    "event_transition_matrix_bucketed",
    "beaconing_score",
    "beaconing_score_bucketed",
    "sessionize_events",
    "sessionize_events_bucketed",
    "percentile_values",
    "dedup_minhash_lsh",
    "text_semantic_pairs_hashed_prefix",
    "text_bpe_tokenize",
)


def main() -> int:
    args = sys.argv[1:]
    k = int(args[0]) if args else 16
    prefixes = tuple(args[1:])
    names = [n for n in AMPLIFIED_ENTRIES if not prefixes or n.startswith(prefixes)]

    base = tempfile.mkdtemp(prefix=f"amp_check_{k}x_")
    spark = get_spark(app_name="check-amplified")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"amplifying sf0.1 by {k}x into {base} ...")
    t0 = time.time()
    amplify(spark, base, k)
    print(f"amplified in {time.time()-t0:.0f}s")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{base}/{t}.parquet"
        if os.path.isdir(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'")
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, base).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:160]}")
            failures += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {type(e).__name__}: {str(e)[:160]}")
            failures += 1
            continue
        sc, sh, scols = value_hash(sdf)
        dc, dh, dcols = value_hash(ddf)
        ok = (scols == dcols) and (sc == dc) and (sh == dh)
        if not ok:
            failures += 1
            print(
                f"FAIL  {name}: rows {sc}/{dc} hash {sh}/{dh} "
                f"cols_match={scols == dcols} [{time.time()-t0:.1f}s]"
            )
            srows = sorted(
                "|".join(map(str, r))
                for r in sdf[scols].itertuples(index=False, name=None)
            )
            drows = sorted(
                "|".join(map(str, r))
                for r in ddf[dcols].itertuples(index=False, name=None)
            ) if scols == dcols else []
            for a, b in zip(srows, drows):
                if a != b:
                    print(f"      spark: {a[:180]}\n      duck : {b[:180]}")
                    break
        else:
            print(f"OK    {name}: {sc} rows hash={sh} [{time.time()-t0:.1f}s]")
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)
    print(
        f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
        f"({len(names)} amplified entries, k={k})"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
