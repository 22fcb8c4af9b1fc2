"""Event-time functions: epoch coercion and report-date derivation (SURVEY §2 B5/B9).

Semantics locked to the reference:

- epoch unit autodetect: value > 1e10 means milliseconds, else seconds
  (reference ``clickhouse/helpers.py:74-76`` and ``:110-113``).
- ``WeekFrom`` = the previous Saturday, where a Saturday maps to ITSELF —
  ``relativedelta(weekday=SA(-1))`` semantics (reference ``clickhouse/helpers.py:79``).
- Output date strings are ``dd/MM/yyyy`` (reference ``clickhouse/helpers.py:81-82``).

All pure Column expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REPORT_DATE_FMT = "dd/MM/yyyy"
_EPOCH_MS_THRESHOLD = 1e10  # reference clickhouse/helpers.py:74-76


def epoch_to_ts(c: Column | str) -> Column:
    """Epoch seconds-or-milliseconds (autodetected) → TimestampType.

    ``> 1e10`` ⇒ milliseconds (divide by 1000), else seconds — exactly the
    reference's branch so t2 hashes agree on the boundary value.
    """
    col = F.col(c) if isinstance(c, str) else c
    d = col.cast("double")
    secs = F.when(d > F.lit(_EPOCH_MS_THRESHOLD), d / F.lit(1000.0)).otherwise(d)
    return secs.cast("timestamp")


def prev_saturday(ts: Column | str) -> Column:
    """DATE of the most recent Saturday at-or-before ``ts`` (Saturday → itself).

    ``dayofweek`` is 1=Sunday … 7=Saturday, so ``dayofweek % 7`` is exactly the
    number of days to step back (Sat→0, Sun→1, …, Fri→6).
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.date_sub(F.to_date(col), F.dayofweek(col) % 7)


def week_from(ts: Column | str) -> Column:
    """``WeekFrom`` string column: previous Saturday as dd/MM/yyyy."""
    return F.date_format(prev_saturday(ts), REPORT_DATE_FMT)


def report_date(ts: Column | str) -> Column:
    """``ReportDate`` string column: event date as dd/MM/yyyy."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(F.to_date(col), REPORT_DATE_FMT)


def date_format_fn(ts: Column | str, fmt: str = REPORT_DATE_FMT) -> Column:
    """AQL ``DATEFORMAT(ts, fmt)`` (SURVEY §2 A12)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(col, fmt)
