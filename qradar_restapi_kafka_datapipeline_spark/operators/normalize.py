"""Event normalization: rename, sanitize, date-derive (SURVEY §2 B5/B6/B8/B9).

The reference normalizes each event dict in Python, one row at a time
(``clickhouse/helpers.py:11-95``).  Here the whole chain is a single declarative
``select`` so Catalyst fuses it with the scan and any downstream filter.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.functions.dates import (
    epoch_to_ts,
    report_date,
    week_from,
)

# The reference's 35-entry display-name map, kept verbatim as data
# (reference clickhouse/helpers.py:13-47).  Collisions (userName/username →
# Username) resolve to the LAST source key present, matching the reference's
# dict-comprehension behavior (clickhouse/helpers.py:49).
RENAME_MAP: dict[str, str] = {
    "domainName_domainId": "domainName",
    "DomainAwareFullNetworkName_sourceIP": "Source Network",
    "DomainAwareFullNetworkName_destinationIP": "Destination Network",
    "DateFormatFunction_StartTime_dd_MM_yyyy": "ReportDate",
    "SUM_eventCount": "Event Count",
    "eventCount": "Event Count",
    "sourceIP": "Source IP",
    "sourceip": "Source IP",
    "destinationIP": "Destination IP",
    "destinationip": "Destination IP",
    "sourcePort": "Source Port",
    "destinationPort": "Destination Port",
    "startTime": "Start Time",
    "starttime": "Start Time",
    "domainId": "Domain",
    "qid": "QID",
    "QidName_qid": "Event Name",
    "CategoryName_category": "Low Level Category",
    "CategoryName_highlevelcategory": "High Level Category",
    "LogSourceName_logSourceId": "Log Source",
    "SensorDeviceName_deviceId": "Log Source",
    "LogSourceTypeName_deviceType": "Log Source Type",
    "SensorDeviceTypeName_deviceType": "Log Source Type",
    "userName": "Username",
    "username": "Username",
    "magnitude": "Magnitude",
    "CustomProperty~null": "bad_key",
    "sourceGeographicLocation": "Source Geographic Country/Region",
    "destinationGeographicLocation": "Destination Geographic Country/Region",
}

_SANITIZE_CHARS = " /(),"  # reference clickhouse/helpers.py:87-95


def clean_column_name(name: str) -> str:
    """Replace `` / ( ) ,`` with ``_`` (reference clickhouse/helpers.py:87-95)."""
    return re.sub(f"[{re.escape(_SANITIZE_CHARS)}]", "_", name)


def rename_events(df: DataFrame, mapping: dict[str, str] | None = None) -> DataFrame:
    """Apply the display-name map; unmapped columns pass through (B6).

    On target-name collision the LAST source column in df.columns order wins,
    mirroring the reference's dict-comprehension overwrite.
    """
    mapping = RENAME_MAP if mapping is None else mapping
    out: dict[str, str] = {}  # target -> source (last wins)
    passthrough: list[str] = []
    for c in df.columns:
        if c in mapping:
            out[mapping[c]] = c
        else:
            passthrough.append(c)
    cols = [F.col(f"`{c}`") for c in passthrough]
    cols += [F.col(f"`{src}`").alias(tgt) for tgt, src in out.items()]
    return df.select(*cols)


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Sink-safe column names (B8): `` / ( ) ,`` → ``_``."""
    return df.select(
        *[F.col(f"`{c}`").alias(clean_column_name(c)) for c in df.columns]
    )


def add_date(
    df: DataFrame,
    time_col: str = "Start Time",
    fallback_col: str = "Time",
) -> DataFrame:
    """Derive ``Start Time``(ts) + ``WeekFrom`` + ``ReportDate`` (B5).

    Mirrors reference ``add_date`` (clickhouse/helpers.py:53-84): epoch ms-vs-s
    autodetected at 1e10; WeekFrom = previous Saturday (Saturday→itself) as
    dd/MM/yyyy; raises if neither time column exists.
    """
    if time_col in df.columns:
        src = time_col
    elif fallback_col in df.columns:
        src = fallback_col
    else:
        raise ValueError(
            f"add_date: neither {time_col!r} nor {fallback_col!r} present"
        )
    c = F.col(f"`{src}`")
    ts = epoch_to_ts(c) if dict(df.dtypes)[src] in ("bigint", "int", "double", "float") else c
    return (
        df.withColumn(time_col, ts)
        .withColumn("WeekFrom", week_from(F.col(f"`{time_col}`")))
        .withColumn("ReportDate", report_date(F.col(f"`{time_col}`")))
    )


def normalize(df: DataFrame) -> DataFrame:
    """Full normalize chain: rename → add_date → sanitize (the etl.py:16-49 path)."""
    return sanitize_columns(add_date(rename_events(df)))
