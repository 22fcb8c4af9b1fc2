"""QRadar-shaped event relation derived from the driver's generic `events` table.

The driver's synthetic ``events`` table (event_id, ts, user_id, event_type, value,
props — TESTDATA.md) stands in for the QRadar event stream.  FIXTURES.md §B says to
synthesize A1-shaped columns (IPs, ports, QIDs, categories, epoch times) from it.

The derivation lives here ONCE as an ANSI-SQL template restricted to the dialect
intersection of Spark SQL and DuckDB, with the only divergent function (epoch
milliseconds) injected per engine.  Both the engine's `qevents` view and the
correctness oracle are rendered from the same string, so the synthetic columns
cannot drift between the system under test and the oracle.

All arithmetic is deterministic int64 math (no floats except explicit FLOOR
division), so hashes agree bit-for-bit across engines.
"""

from __future__ import annotations

# Dialect notes:
# - `%` modulo, CASE, ||, CAST(x AS STRING/BIGINT/INT) work in both engines.
# - Integer division differs (Spark `/` → double with truncating cast; DuckDB
#   CAST rounds), so every division goes through FLOOR(x / const.0) explicitly.
# - {epoch_ms} = unix_millis(ts) on Spark, epoch_ms(ts) on DuckDB.
_QEVENTS_TEMPLATE = """
WITH base AS (
  SELECT
    event_id,
    ts,
    user_id,
    event_type,
    value,
    {epoch_ms} AS __ms,
    (event_id * 2654435761) % 4294967296 AS __h1,
    (event_id * 104729 + 7919) % 4294967296 AS __h2
  FROM {events_table}
)
SELECT
  event_id,
  ts,
  user_id % 5 AS domainId,
  1 + (event_id % 5) AS eventCount,
  -- startTime: epoch ms normally, epoch SECONDS for every 10th event, to
  -- exercise the reference's >1e10 unit autodetect (clickhouse/helpers.py:74-76)
  CASE WHEN event_id % 10 = 0
       THEN CAST(FLOOR(__ms / 1000.0) AS BIGINT)
       ELSE __ms END AS startTime,
  -- source IP: 3 RFC1918 families + public, so INCIDR predicates select real subsets
  CASE
    WHEN event_id % 4 = 0 THEN 167772160 + (__h1 % 16777216)
    WHEN event_id % 4 = 1 THEN 3232235520 + (__h1 % 65536)
    WHEN event_id % 4 = 2 THEN 2886729728 + (__h1 % 1048576)
    ELSE __h1
  END AS sourceIPlong,
  -- % 7 deliberately coprime with the highlevelcategory modulus (% 3): the
  -- AllowedOutbound AQL query needs events with hlc=4000 AND a public dest IP,
  -- which a shared modulus would make structurally impossible.
  CASE
    WHEN event_id % 7 = 0 THEN 167772160 + (__h2 % 16777216)
    ELSE __h2
  END AS destinationIPlong,
  CAST(1 + (__h1 % 65535) AS INT) AS sourcePort,
  CAST((event_id * 17) % 200 AS INT) AS destinationPort,
  event_id % 100 AS qid,
  CAST(4000 + (event_id % 40) AS INT) AS category,
  CAST(4000 + (event_id % 3) AS INT) AS highlevelcategory,
  CAST(event_id % 20 AS INT) AS devicetype,
  event_id % 50 AS logSourceId,
  CAST(event_id % 10 AS INT) AS magnitude,
  'user_' || CAST(user_id AS STRING) AS userName,
  event_type AS eventName,
  -- custom-property columns the AQL corpus references with double-quoted
  -- identifiers (reference qradar/input/queries.json:2-3: "Rule Name",
  -- "Mitre Tactic", "Policy Name", Action, geographic locations)
  'rule_' || CAST(event_id % 7 AS STRING) AS {q}Rule Name{q},
  'tactic_' || CAST(event_id % 5 AS STRING) AS {q}Mitre Tactic{q},
  'technique_' || CAST(event_id % 8 AS STRING) AS {q}Mitre Technique{q},
  'country_' || CAST(__h1 % 10 AS STRING) AS sourceGeographicLocation,
  'country_' || CAST(__h2 % 10 AS STRING) AS destinationGeographicLocation,
  CASE WHEN event_id % 2 = 0 THEN 'Allow' ELSE 'Deny' END AS Action,
  'policy_' || CAST(event_id % 3 AS STRING) AS {q}Policy Name{q}
FROM base
"""

_IP_STR = (
    "CAST(CAST(FLOOR({col} / 16777216.0) AS BIGINT) % 256 AS STRING) || '.' || "
    "CAST(CAST(FLOOR({col} / 65536.0) AS BIGINT) % 256 AS STRING) || '.' || "
    "CAST(CAST(FLOOR({col} / 256.0) AS BIGINT) % 256 AS STRING) || '.' || "
    "CAST({col} % 256 AS STRING)"
)

# Wrap: add dotted-quad string forms of the IP columns.
_QEVENTS_WRAPPED = (
    "SELECT q.*, "
    + _IP_STR.format(col="sourceIPlong")
    + " AS sourceip, "
    + _IP_STR.format(col="destinationIPlong")
    + " AS destinationip FROM ("
    + _QEVENTS_TEMPLATE
    + ") q"
)


def qevents_sql(dialect: str, events_table: str = "events") -> str:
    """Render the qevents derivation for 'spark' or 'duckdb'."""
    if dialect == "spark":
        epoch_ms, q = "unix_millis(ts)", "`"
    elif dialect == "duckdb":
        epoch_ms, q = "epoch_ms(ts)", '"'
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    return _QEVENTS_WRAPPED.format(epoch_ms=epoch_ms, events_table=events_table, q=q)


def qevents_cte(dialect: str, events_table: str = "events") -> str:
    """The derivation as a CTE body for embedding in oracle SQL strings."""
    return qevents_sql(dialect, events_table)
