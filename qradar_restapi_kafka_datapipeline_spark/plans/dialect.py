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

# The engine's default network hierarchy backing FULLNETWORKNAME, PER DOMAIN —
# QRadar's network table is domain-scoped and the reference passes the domain
# in every call (`FULLNETWORKNAME(SourceIP, DomainID)`,
# qradar/input/queries.json:2-3); the engine owns the table as config.
# Rows are (domainId, cidr, network_name).  Overlapping prefixes exercise
# longest-prefix-match (10.64/10 wins over 10/8), and the domains deliberately
# DISAGREE on the 10.64/10 overlay so the decode is observably
# domain-sensitive: domain 1 names it differently and domain 2 lacks it
# entirely (falls through to net_10).
_BASE_NETWORKS: list[tuple[str, str]] = [
    ("10.0.0.0/8", "net_10"),
    ("10.64.0.0/10", "net_10_64"),
    ("172.16.0.0/12", "net_172"),
    ("192.168.0.0/16", "net_192"),
    ("169.254.0.0/16", "net_linklocal"),
    ("127.0.0.0/8", "net_loopback"),
]

DEFAULT_DOMAIN = 0  # one-argument FULLNETWORKNAME(ip) resolves in this domain

DEFAULT_NETWORKS: list[tuple[int, str, str]] = [
    (dom, cidr, name)
    for dom in range(5)
    for cidr, name in _BASE_NETWORKS
    if not (dom == 2 and cidr == "10.64.0.0/10")
]
for _i, (_d, _c, _n) in enumerate(DEFAULT_NETWORKS):
    if _d == 1 and _c == "10.64.0.0/10":
        DEFAULT_NETWORKS[_i] = (1, "10.64.0.0/10", "net_dmz_d1")


#: qevents ships precomputed int64 twins of its dotted-quad IP columns — the
#: STRING forms are DERIVED from these longs (sources/qevents.py `_IP_STR`
#: renders the 4 base-256 digits of a value < 2^32, and ip2long recombines
#: exactly those digits), so reading the long directly is value-identical,
#: row for row, in BOTH engines (the oracle's qevents carries the same
#: columns from the same template).  r13, guide §4/§2.1: every INCIDR /
#: FULLNETWORKNAME call was re-splitting the same string 4× per probe — the
#: flagship AQL filter carried ~50 split-recombine chains per row, pushing
#: the predicate past the codegen budget into interpreted evaluation.
IPLONG_TWINS = {
    "sourceip": "sourceIPlong",
    "destinationip": "destinationIPlong",
}


def ip2long_expr(col: str) -> str:
    """Dotted-quad → int64. Valid in Spark SQL and DuckDB (split_part is 1-based
    in both).  Columns with a precomputed long twin (:data:`IPLONG_TWINS`)
    emit the twin column instead of the split-recombine chain."""
    # AQL is case-insensitive on identifiers (the corpus writes `SourceIP`);
    # the lookup matches accordingly and emits the canonical column name,
    # which both engines resolve (Spark via the translator's identifier-case
    # normalization pass, DuckDB natively).
    twin = IPLONG_TWINS.get(col.strip().lower())
    if twin is not None:
        return twin
    p = [f"CAST(split_part({col}, '.', {i}) AS BIGINT)" for i in (1, 2, 3, 4)]
    return f"({p[0]}*16777216 + {p[1]}*65536 + {p[2]}*256 + {p[3]})"


def incidr_expr(cidr: str, col: str) -> str:
    """AQL INCIDR with the CIDR literal folded to (net, mask) int constants."""
    net, mask = _parse_cidr(cidr)
    return f"(({ip2long_expr(col)} & {mask}) = {net})"


def _lpm_chain(ip: str, networks: list[tuple[str, str]], default: str) -> str:
    """One domain's longest-prefix-first CASE chain over a precomputed ip expr."""
    parsed = []
    for cidr, name in networks:
        net, mask = _parse_cidr(cidr)
        plen = bin(mask).count("1")
        parsed.append((plen, cidr, name, net, mask))
    parsed.sort(key=lambda t: (-t[0], t[2]))
    branches = " ".join(
        f"WHEN (({ip} & {mask}) = {net}) THEN '{name}'"
        for _plen, _cidr, name, net, mask in parsed
    )
    return f"(CASE {branches} ELSE '{default}' END)"


def fullnetworkname_expr(
    col: str,
    domain_col: str | None = None,
    networks: list[tuple[int, str, str]] | None = None,
    default: str = "other",
) -> str:
    """AQL ``FULLNETWORKNAME(ip[, domainId])`` as a folded CASE (SURVEY §2 A11).

    For a plan-time-known network table a folded CASE beats a join: zero
    shuffle, pure codegen.  Within a domain, branch order = prefix length
    descending, so the first hit IS the longest prefix.  With ``domain_col``
    the outer simple CASE selects that domain's chain — QRadar's LPM is
    domain-scoped (reference qradar/input/queries.json:2-3 passes DomainID in
    every call).  Without it, the chain of ``DEFAULT_DOMAIN`` applies (the
    one-arg AQL form resolves in the default domain).  ``networks`` rows are
    (domainId, cidr, name).  For network tables too large to fold (thousands
    of rows), use the broadcast-join path
    :func:`~qradar_restapi_kafka_datapipeline_spark.functions.decode.full_network_name`
    instead — same semantics, join instead of codegen.
    """
    networks = DEFAULT_NETWORKS if networks is None else networks
    by_domain: dict[int, list[tuple[str, str]]] = {}
    for dom, cidr, name in networks:
        by_domain.setdefault(dom, []).append((cidr, name))
    ip = ip2long_expr(col)
    if domain_col is None:
        return _lpm_chain(ip, by_domain.get(DEFAULT_DOMAIN, []), default)
    whens = " ".join(
        f"WHEN {dom} THEN {_lpm_chain(ip, doms, default)}"
        for dom, doms in sorted(by_domain.items())
    )
    return f"(CASE CAST({domain_col} AS BIGINT) {whens} ELSE '{default}' END)"


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
