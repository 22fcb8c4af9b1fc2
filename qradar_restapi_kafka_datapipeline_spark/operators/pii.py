"""PII detection / redaction for training-data pipelines (north-star M6).

Large-scale corpus prep scrubs personally-identifiable strings (emails, IPs,
phone numbers, long account numbers) before training — the standard pass in
C4/RefinedWeb-style pipelines.  Everything here is built-in ``regexp_replace``
/ ``regexp_count`` expressions — JVM-side, whole-stage codegen, no Python in
the row path — so redaction costs the same as any other projection at 100 TB.

Design: each pattern is written once in RE2-compatible syntax (no lookarounds,
no backreferences) so the SAME pattern string drives Spark (Java regex) and the
DuckDB oracle (RE2); the builders emit dialect-correct SQL around it (DuckDB
``regexp_replace`` replaces only the first match unless passed the ``'g'``
flag; Spark always replaces all).

The reference repo has no PII layer (its events stay inside QRadar); this is
part of the beyond-reference training-data surface (SURVEY §2 north-star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: specific → general.  Email must run before the bare-domain/IP rules
# (the address part would otherwise be half-eaten); the long-digit-run rule is
# last so phone formats keep their tag.  Each pattern is RE2 ∩ java.util.regex.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (tag, pattern, replacement)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("idnum", r"\b\d{13,19}\b", "<ID>"),
]


def _sql_quote(pat: str, dialect: str) -> str:
    """Pattern → SQL string literal.  Spark SQL literals process backslash
    escapes (``'\\d'`` is needed to mean ``\\d``); DuckDB literals are raw."""
    if dialect == "spark":
        return "'" + pat.replace("\\", "\\\\") + "'"
    return "'" + pat + "'"


def pii_redact_sql(col: str, dialect: str) -> str:
    """Expression: ``col`` with every PII match replaced by its tag.

    The chain applies patterns in PII_PATTERNS order — a pure nested
    ``regexp_replace`` expression, one codegen span.
    """
    expr = col
    for _tag, pat, repl in PII_PATTERNS:
        lit = _sql_quote(pat, dialect)
        if dialect == "spark":
            expr = f"regexp_replace({expr}, {lit}, '{repl}')"
        else:
            expr = f"regexp_replace({expr}, {lit}, '{repl}', 'g')"
    return expr


def pii_count_sql(col: str, tag: str, dialect: str) -> str:
    """Expression: number of matches of one PII class in ``col``.

    Counted on the PRE-redaction text via the same patterns.  Spark has a
    native ``regexp_count``; DuckDB counts via ``regexp_extract_all``.
    """
    pat = next(p for t, p, _ in PII_PATTERNS if t == tag)
    lit = _sql_quote(pat, dialect)
    if dialect == "spark":
        return f"regexp_count({col}, {lit})"
    return f"len(regexp_extract_all({col}, {lit}))"


def pii_redact(col: str = "text") -> Column:
    return F.expr(pii_redact_sql(col, "spark"))


def pii_report_sql(dialect: str, source: str = "qevents") -> str:
    """Per-eventName PII audit over a reconstructed log line.

    The synthetic corpus carries no free-text PII, so the audit derives the
    message deterministically from real event columns (userName, sourceip) —
    the redactor then has genuine work to do and both engines derive the
    identical input.  Output: match counts per class plus the exact redacted
    char delta, so a drifting pattern changes the hash.
    """
    msg = (
        "concat(userName, ' <', userName, '@corp.example.com> login from ', "
        "sourceip, ' ref ', CAST(1000000000000 + eventCount AS STRING), "
        "' call 555-', substr(CAST(1000000 + qid AS STRING), 2, 3), '-', "
        "substr(CAST(10000000 + qid AS STRING), 4, 4))"
        if dialect == "spark"
        else
        "concat(userName, ' <', userName, '@corp.example.com> login from ', "
        "sourceip, ' ref ', CAST(1000000000000 + eventCount AS VARCHAR), "
        "' call 555-', substr(CAST(1000000 + qid AS VARCHAR), 2, 3), '-', "
        "substr(CAST(10000000 + qid AS VARCHAR), 4, 4))"
    )
    red = pii_redact_sql("msg", dialect)
    counts = ", ".join(
        f"CAST(SUM({pii_count_sql('msg', tag, dialect)}) AS BIGINT) AS n_{tag}"
        for tag, _p, _r in PII_PATTERNS
    )
    # subquery, not a WITH: the oracle wrapper prepends its own WITH chain
    return (
        f"SELECT eventName, COUNT(*) AS n_msgs, {counts}, "
        f"CAST(SUM(length(msg) - length({red})) AS BIGINT) AS chars_delta "
        f"FROM (SELECT eventName, {msg} AS msg FROM {source}) raw "
        f"GROUP BY eventName"
    )
