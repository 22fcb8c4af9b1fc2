#!/usr/bin/env python3
"""Round-14 optimization profiler: per-query wall time, Spark JOB count and
formatted plans for the bench headline queries.

    python3 tools/r14_profile.py [--plans] [name ...]

Mirrors bench.py's environment exactly (materialized qevents, cold builds
paid first), then for each requested query (default: every HEADLINE name):

- runs the query twice through the noop sink, records both timings (min =
  the steady number bench reports);
- counts the Spark JOBS the invocation launched (job-group tagging) — at
  sf0.1 the data is tiny, so job/stage scheduling is the dominant cost and
  job count is the honest per-query overhead proxy;
- with --plans, writes ``plans/r14/<name>_before.txt`` (or ``_after.txt``
  with --after) holding ``explain("formatted")`` of the returned DataFrame.

Output: one JSON line per query on stdout, prefixed PROF| for easy grep.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qradar_restapi_kafka_datapipeline_spark.engine import get_spark
from qradar_restapi_kafka_datapipeline_spark.entry_queries import registry, setup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    write_plans = "--plans" in args
    suffix = "_after" if "--after" in args else "_before"
    names = [a for a in args if not a.startswith("--")]

    import bench

    spark = get_spark(app_name="r14-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    tmp = tempfile.mkdtemp(prefix="r14_prof_qevents_")
    setup(spark, SF_DIR, events_partitions=32)
    spark.table("qevents").write.mode("overwrite").option(
        "compression", "lz4"
    ).parquet(f"{tmp}/qevents")
    spark.read.parquet(f"{tmp}/qevents").createOrReplaceTempView("qevents")
    from qradar_restapi_kafka_datapipeline_spark.views import (
        register_globalviews,
        register_ref_sets,
    )

    register_globalviews(spark)
    register_ref_sets(spark)

    reg = registry()
    extra = bench._extra_paths()

    def runner(name):
        return extra.get(name) or (reg[name].run if name in reg else None)

    if not names:
        names = [n for n in bench.HEADLINE if runner(n) is not None]

    # cold builds first (memoized artifacts), exactly like bench.py.
    # --skipcold: skip the warmup (focused profiling — pass 1 of each
    # requested entry then pays its own memoized build; pass 2 is steady).
    for name in ([] if "--skipcold" in args else bench.COLD_BUILDS):
        fn = runner(name)
        if fn is not None:
            _consume(fn(spark, SF_DIR))

    if write_plans:
        os.makedirs(PLANS_DIR, exist_ok=True)

    tracker = sc.statusTracker()
    for name in names:
        fn = runner(name)
        if fn is None:
            print(f"PROF|{json.dumps({'name': name, 'error': 'unknown'})}")
            continue
        times = []
        jobs = 0
        for i in range(2):
            group = f"r14prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t_build = time.time() - t0
            _consume(df)
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            times.append(round(dt, 3))
            ids = tracker.getJobIdsForGroup(group)
            if i == 1:
                jobs = len(ids)
                build_sec = round(t_build, 3)
        if write_plans:
            with open(os.path.join(PLANS_DIR, f"{name}{suffix}.txt"), "w") as f:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                f.write(buf.getvalue())
        print(
            f"PROF|{json.dumps({'name': name, 'runs': times, 'min': min(times), 'jobs': jobs, 'df_build_sec': build_sec})}",
            flush=True,
        )

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
