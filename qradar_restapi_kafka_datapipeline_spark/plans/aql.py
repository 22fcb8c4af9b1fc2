"""AQL → SQL frontend (SURVEY §2 2A, §7.1 M2) — dialect-parameterized.

The reference declares its query surface as AQL template strings shipped to
QRadar's Ariel engine (``qradar/input/queries.json:2-3``,
``qradar/input/new_queries.json:2-12``, templating ``qradar/query_builder.py:59-66``).
This module makes that surface native: a token-level rewriter from AQL to
executable SQL, emitting either

- **Spark SQL** (the engine): scalar functions resolve to SQL UDFs registered by
  :func:`register_aql_functions` — Catalyst inlines SQL-UDF bodies, so the whole
  translated query is one declarative tree (pushdown, pruning, whole-stage
  codegen all apply; no Python in the row path); or
- **DuckDB SQL** (the correctness oracle): scalar functions are inlined as
  expressions from ``plans.dialect`` and the event relation/reference sets
  become CTEs — so oracle and engine both derive from the *same AQL text*.

Translation passes (SURVEY §7.1 M2):
  {param} substitution (A16) → strip PARAMETERS REMOTESERVERS (A14) →
  GLOBALVIEW routing (A2) → REFERENCESETCONTAINS → IN-subquery (A9, a broadcast
  semi-join in Spark) → quote normalization (A3) → START/STOP → event-time range
  predicate (A13) → identifier-case normalization (AQL is case-insensitive on
  columns; the Spark session is case-sensitive).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from qradar_restapi_kafka_datapipeline_spark.plans.dialect import (
    DECODE_EXPRS,
    fullnetworkname_expr,
    incidr_expr,
    ip2long_expr,
)

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _java_fmt_to_strftime(fmt: str) -> str:
    """Minimal Java date-format → strftime mapping for the corpus formats."""
    out = fmt
    for java, pct in (("yyyy", "%Y"), ("dd", "%d"), ("MM", "%m"), ("HH", "%H"),
                      ("mm", "%M"), ("ss", "%S")):
        out = out.replace(java, pct)
    return out


def register_aql_functions(spark: SparkSession) -> None:
    """Register the AQL scalar library as SQL UDFs (inlined by Catalyst).

    SQL function names are case-insensitive, so AQL's ``DOMAINNAME(...)`` /
    ``incidr(...)`` / ``INCIDR (...)`` spellings all resolve unrewritten.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION aql_ip2long(ip STRING) RETURNS BIGINT RETURN "
        "CASE WHEN ip RLIKE '^\\\\d{1,3}\\\\.\\\\d{1,3}\\\\.\\\\d{1,3}\\\\.\\\\d{1,3}$' "
        f"THEN {ip2long_expr('ip')} END"
    )
    # Dynamic-argument INCIDR: parse the CIDR in SQL. pow(2, 32-plen) is exact
    # in double up to 2^32; a missing '/len' means a /32 host route.
    _mask = (
        "(4294967296 - CAST(pow(2.0, 32 - CAST(coalesce(nullif("
        "split_part(cidr, '/', 2), ''), '32') AS INT)) AS BIGINT))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION incidr(cidr STRING, ip STRING) RETURNS BOOLEAN RETURN "
        f"coalesce((aql_ip2long(ip) & {_mask}) = "
        f"(aql_ip2long(split_part(cidr, '/', 1)) & {_mask}), false)"
    )
    for fname, expr_fn in DECODE_EXPRS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {fname}(id BIGINT) RETURNS STRING "
            f"RETURN {expr_fn('id')}"
        )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION fullnetworkname(ip STRING, domain BIGINT) "
        f"RETURNS STRING RETURN {fullnetworkname_expr('ip')}"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dateformat(ts TIMESTAMP, fmt STRING) "
        "RETURNS STRING RETURN date_format(ts, fmt)"
    )


# ---------------------------------------------------------------------------
# rewrite passes (dialect-parameterized pure functions)
# ---------------------------------------------------------------------------

def _strip_parameters(q: str) -> str:
    return re.sub(r"\s+PARAMETERS\s+REMOTESERVERS\s*=.*$", "", q, flags=re.I | re.S)


def _rewrite_globalview(q: str, dialect: str, events_view: str) -> str:
    def sub(m: re.Match) -> str:
        view = m.group(1)
        if not re.fullmatch(_IDENT, view):
            raise ValueError(f"bad GLOBALVIEW name {view!r}")
        if dialect == "duckdb":
            from qradar_restapi_kafka_datapipeline_spark.views import globalview_sql

            return f"FROM ({globalview_sql(view, events_view)}) AS {view}"
        return f"FROM {view}"

    return re.sub(
        r"FROM\s+GLOBALVIEW\s*\(\s*'([^']+)'\s*,\s*'[^']*'\s*\)", sub, q, flags=re.I
    )


def _rewrite_refset(q: str, ref_sets_view: str) -> str:
    def sub(m: re.Match) -> str:
        set_name, col = m.group(1), m.group(2)
        return (
            f"({col} IN (SELECT value FROM {ref_sets_view} "
            f"WHERE set_name = '{set_name}'))"
        )

    return re.sub(
        rf"REFERENCESETCONTAINS\s*\(\s*'([^']+)'\s*,\s*({_IDENT})\s*\)",
        sub,
        q,
        flags=re.I,
    )


def _inline_functions(q: str, dialect: str) -> str:
    """Replace AQL scalar calls with dialect-shared constant-folded expressions.

    Inlining (rather than calling the registered SQL UDFs) matters for Spark:
    the dynamic-CIDR UDF body expands ~9 INCIDR + 2 FULLNETWORKNAME calls past
    janino's 64 KB codegen limit, forcing interpreted fallback. The folded forms
    keep the WHERE clause inside whole-stage codegen. The same expression text
    runs on DuckDB, keeping the oracle bit-identical.

    Corpus arguments are flat (identifiers / string literals, no nesting), so a
    non-paren argument regex is sufficient and safe.
    """
    def args_of(s: str) -> list[str]:
        return [a.strip() for a in s.split(",")]

    def sub_incidr(m: re.Match) -> str:
        cidr, col = args_of(m.group(1))
        return incidr_expr(cidr.strip("'"), col)

    q = re.sub(r"INCIDR\s*\(([^()]*)\)", sub_incidr, q, flags=re.I)

    def sub_fnn(m: re.Match) -> str:
        parts = args_of(m.group(1))
        return fullnetworkname_expr(parts[0])

    q = re.sub(r"FULLNETWORKNAME\s*\(([^()]*)\)", sub_fnn, q, flags=re.I)

    for fname, expr_fn in DECODE_EXPRS.items():
        q = re.sub(
            rf"{fname}\s*\(([^()]*)\)",
            lambda m, f=expr_fn: f(m.group(1).strip()),
            q,
            flags=re.I,
        )

    def sub_datefmt(m: re.Match) -> str:
        col, fmt = args_of(m.group(1))
        fmt = fmt.strip(chr(39))
        if dialect == "duckdb":
            return f"strftime({col}, '{_java_fmt_to_strftime(fmt)}')"
        return f"date_format({col}, '{fmt}')"

    q = re.sub(r"DATEFORMAT\s*\(([^()]*)\)", sub_datefmt, q, flags=re.I)
    return q


def _rewrite_quotes(q: str, dialect: str) -> str:
    if dialect == "spark":
        q = re.sub(r'"([^"]+)"', r"`\1`", q)
        q = re.sub(r"(\bAS\s+)'([^']+)'", r"\1`\2`", q, flags=re.I)
    else:
        q = re.sub(r"(\bAS\s+)'([^']+)'", r'\1"\2"', q, flags=re.I)
    return q


def _inject_where_pred(q: str, pred: str) -> str:
    """Fold ``pred`` into the query's WHERE clause (creating one if absent),
    always ahead of GROUP BY/ORDER BY/HAVING/LIMIT — AQL's time clauses sit
    AFTER those, where plain in-place insertion would be invalid SQL."""
    clause = r"\b(GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT)\b"
    mw = re.search(r"\bWHERE\b", q, flags=re.I)
    if mw:
        # wrap the existing WHERE body so `pred AND (body)` binds correctly
        tail = re.search(clause, q[mw.end():], flags=re.I)
        end = mw.end() + (tail.start() if tail else len(q) - mw.end())
        return (
            q[: mw.end()] + f" {pred} AND (" + q[mw.end():end].strip() + ") "
            + q[end:]
        )
    tail = re.search(clause, q, flags=re.I)
    at = tail.start() if tail else len(q)
    return q[:at] + f" WHERE {pred} " + q[at:]


def _rewrite_last(q: str, time_col: str, now_expr: str | None) -> str:
    """AQL ``LAST n MINUTES|HOURS|DAYS`` → sliding time-range predicate.

    ``now_expr`` anchors the window (SQL expression text); defaults to the
    engine clock — pass a timestamp literal for reproducible runs/tests.
    """
    m = re.search(r"\bLAST\s+(\d+)\s+(MINUTES?|HOURS?|DAYS?)\b", q, flags=re.I)
    if not m:
        return q
    n, unit = m.group(1), m.group(2).upper().rstrip("S")
    now = now_expr or "current_timestamp()"
    pred = f"({time_col} >= {now} - INTERVAL '{n}' {unit})"
    return _inject_where_pred(q[: m.start()] + q[m.end():], pred)


def _rewrite_start_stop(q: str, time_col: str) -> str:
    m = re.search(r"\bSTART\s+'([^']+)'\s+STOP\s+'([^']+)'", q, flags=re.I)
    if not m:
        return q
    t0, t1 = m.group(1), m.group(2)
    pred = f"({time_col} >= timestamp'{t0}' AND {time_col} < timestamp'{t1}')"
    return _inject_where_pred(q[: m.start()] + q[m.end():], pred)


def _normalize_identifier_case(q: str, columns: list[str]) -> str:
    for col in columns:
        if not re.fullmatch(_IDENT, col):
            continue  # space-bearing names arrive backtick-quoted already
        q = re.sub(rf"(?<![`'\w\.]){re.escape(col)}(?![`'\w])", col, q, flags=re.I)
    return q


def translate(
    aql: str,
    params: dict[str, str] | None = None,
    dialect: str = "spark",
    events_view: str = "qevents",
    time_col: str = "ts",
    ref_sets_view: str = "ref_sets",
    columns: list[str] | None = None,
    now_expr: str | None = None,
) -> str:
    """AQL text → executable SQL text in the target dialect.

    GROUP BY / ORDER BY / LIMIT / HAVING pass through untouched (valid in both
    dialects); the AQL-specific clauses (START/STOP, LAST, PARAMETERS,
    GLOBALVIEW, quoted aliases, scalar functions) are rewritten.
    """
    q = aql.format(**params) if params else aql
    q = _strip_parameters(q)
    q = _rewrite_globalview(q, dialect, events_view)
    q = re.sub(r"\bFROM\s+events\b", f"FROM {events_view}", q, flags=re.I)
    q = _rewrite_refset(q, ref_sets_view)
    q = _inline_functions(q, dialect)
    q = _rewrite_quotes(q, dialect)
    q = _rewrite_start_stop(q, time_col)
    q = _rewrite_last(q, time_col, now_expr)
    if dialect == "spark" and columns:
        q = _normalize_identifier_case(q, columns)
    return q


def aql_oracle_sql(aql: str, params: dict[str, str] | None = None) -> str:
    """Full DuckDB oracle query for an AQL string: qevents + ref_sets CTEs +
    the duckdb-dialect translation. Runs on the raw parquet views alone."""
    from qradar_restapi_kafka_datapipeline_spark.sources.qevents import qevents_sql
    from qradar_restapi_kafka_datapipeline_spark.views import REF_SETS_SQL

    body = translate(aql, params, dialect="duckdb")
    return (
        f"WITH qevents AS ({qevents_sql('duckdb')}), "
        f"ref_sets AS ({REF_SETS_SQL}) {body}"
    )


class AQLFrontend:
    """Translate + run AQL text against the engine's registered views."""

    def __init__(
        self,
        spark: SparkSession,
        events_view: str = "qevents",
        time_col: str = "ts",
        ref_sets_view: str = "ref_sets",
    ) -> None:
        self.spark = spark
        self.events_view = events_view
        self.time_col = time_col
        self.ref_sets_view = ref_sets_view
        register_aql_functions(spark)

    def translate(self, aql: str, params: dict[str, str] | None = None) -> str:
        m = re.search(r"\bFROM\s+(?:GLOBALVIEW\s*\(\s*'([^']+)'|(\w+))", aql, flags=re.I)
        view = (m.group(1) or m.group(2)) if m else None
        if view and view.lower() == "events":
            view = self.events_view
        cols: list[str] = []
        if view:
            try:
                cols = self.spark.table(view).columns
            except Exception:
                cols = []
        return translate(
            aql,
            params,
            dialect="spark",
            events_view=self.events_view,
            time_col=self.time_col,
            ref_sets_view=self.ref_sets_view,
            columns=cols,
        )

    def sql(self, aql: str, params: dict[str, str] | None = None) -> DataFrame:
        return self.spark.sql(self.translate(aql, params))
