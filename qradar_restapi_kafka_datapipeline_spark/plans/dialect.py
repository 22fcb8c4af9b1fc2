"""Dialect-shared SQL expression builders.

Every AQL scalar function (SURVEY §2 A8–A12) has one canonical semantics; these
helpers emit that semantics as an SQL expression string valid in BOTH Spark SQL
and DuckDB (the correctness oracle).  Restricting to the dialect intersection
(split_part, CASE, ||, &, CAST) means the engine and the oracle can never drift.

INCIDR constants are folded in Python at plan-build time — the emitted predicate
is one AND + one comparison, fully inside whole-stage codegen.
"""

from __future__ import annotations

from qradar_restapi_kafka_datapipeline_spark.functions.ip import _parse_cidr

# The engine's default network hierarchy backing FULLNETWORKNAME (the reference
# reads QRadar's per-domain network table; the engine owns this as config).
# Overlapping prefixes exercise longest-prefix-match: 10.64/10 wins over 10/8.
DEFAULT_NETWORKS: list[tuple[str, str]] = [
    ("10.0.0.0/8", "net_10"),
    ("10.64.0.0/10", "net_10_64"),
    ("172.16.0.0/12", "net_172"),
    ("192.168.0.0/16", "net_192"),
    ("169.254.0.0/16", "net_linklocal"),
    ("127.0.0.0/8", "net_loopback"),
]


def ip2long_expr(col: str) -> str:
    """Dotted-quad → int64. Valid in Spark SQL and DuckDB (split_part is 1-based
    in both)."""
    p = [f"CAST(split_part({col}, '.', {i}) AS BIGINT)" for i in (1, 2, 3, 4)]
    return f"({p[0]}*16777216 + {p[1]}*65536 + {p[2]}*256 + {p[3]})"


def incidr_expr(cidr: str, col: str) -> str:
    """AQL INCIDR with the CIDR literal folded to (net, mask) int constants."""
    net, mask = _parse_cidr(cidr)
    return f"(({ip2long_expr(col)} & {mask}) = {net})"


def fullnetworkname_expr(
    col: str, networks: list[tuple[str, str]] | None = None, default: str = "other"
) -> str:
    """AQL FULLNETWORKNAME as a longest-prefix-first CASE chain (SURVEY §2 A11).

    For a plan-time-known network table a folded CASE beats a join: zero shuffle,
    pure codegen. Branch order = prefix length descending, so the first hit IS
    the longest prefix.
    """
    networks = DEFAULT_NETWORKS if networks is None else networks
    parsed = []
    for cidr, name in networks:
        net, mask = _parse_cidr(cidr)
        plen = bin(mask).count("1")
        parsed.append((plen, cidr, name, net, mask))
    parsed.sort(key=lambda t: (-t[0], t[2]))
    ip = ip2long_expr(col)
    branches = " ".join(
        f"WHEN (({ip} & {mask}) = {net}) THEN '{name}'"
        for _plen, _cidr, name, net, mask in parsed
    )
    return f"(CASE {branches} ELSE '{default}' END)"


# --- dimension decodes -------------------------------------------------------
# Semantics identical to functions.decode.build_dims (the broadcast-join path);
# as expressions they inline into SQL for both engines.

def domainname_expr(col: str) -> str:
    return f"(CASE WHEN {col} >= 0 AND {col} <= 4 THEN 'customer_' || CAST({col} AS STRING) END)"


def qidname_expr(col: str) -> str:
    return f"(CASE WHEN {col} >= 0 AND {col} <= 99 THEN 'event_' || CAST({col} AS STRING) END)"


def logsourcename_expr(col: str) -> str:
    return f"(CASE WHEN {col} >= 0 AND {col} <= 49 THEN 'logsource_' || CAST({col} AS STRING) END)"


def logsourcetypename_expr(col: str) -> str:
    return (
        f"(CASE WHEN {col} = 0 THEN 'Custom Rule Engine' "
        f"WHEN {col} >= 1 AND {col} <= 19 THEN 'devicetype_' || CAST({col} AS STRING) END)"
    )


def categoryname_expr(col: str) -> str:
    return f"(CASE WHEN {col} >= 4000 AND {col} <= 4039 THEN 'cat_' || CAST({col} AS STRING) END)"


DECODE_EXPRS = {
    "domainname": domainname_expr,
    "qidname": qidname_expr,
    "logsourcename": logsourcename_expr,
    "sensordevicename": logsourcename_expr,      # SENSORDEVICENAME ≡ LOGSOURCENAME
    "logsourcetypename": logsourcetypename_expr,
    "sensordevicetypename": logsourcetypename_expr,
    "categoryname": categoryname_expr,
}
