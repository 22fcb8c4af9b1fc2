"""The engine's AQL query registry.

Mirrors the reference's query inputs (``qradar/input/queries.json:2-3`` and
``qradar/input/new_queries.json:2-12`` — loaded by ``attributes.py:42-51``): the
two raw-event traffic queries plus the nine GLOBALVIEW scans, kept verbatim as
declarative query *definitions* (the WHAT the engine must compute).  Execution
is entirely this engine's AQL frontend → Spark SQL (plans/aql.py), not QRadar.
"""

from __future__ import annotations

ALLOWED_INBOUND_TRAFFIC = (
    "SELECT DOMAINNAME(domainId) AS domainName, domainId AS 'Domain', eventCount"
    "  AS  'Event Count', sourceIP  AS 'Source IP', destinationPort  AS "
    " 'Destination Port', \"Rule Name\" as 'Rule Name (custom)', destinationIP "
    " AS  'Destination IP', LOGSOURCETYPENAME(devicetype) AS 'Log Source Type',"
    " startTime AS 'Start Time', FULLNETWORKNAME(destinationip, domainId) as "
    "'Destination Network', FULLNETWORKNAME(SourceIP, DomainID)  AS  "
    "'Source Network', \"sourceGeographicLocation\" as "
    "'Source Geographic Country/Region', sourcePort  AS  'Source Port', "
    "\"Mitre Tactic\" AS 'Mitre Tactic', \"Mitre Technique\" AS 'Mitre Technique'"
    " FROM events WHERE DOMAINNAME(domainId) = '{customer_name}' AND "
    "((destinationport NOT IN (0, 1, 2, 3, 43, 161, 162) AND "
    "((highlevelcategory = 4000 AND category IN (4002, 4007, 4012, 4016, 4025,"
    " 4027, 4031, 4037, 4039))) AND NOT (INCIDR('10.0.0.0/8',sourceip) OR "
    "INCIDR('0.0.0.0/8',sourceip) OR INCIDR('172.16.0.0/12', sourceip) OR "
    "INCIDR('192.168.0.0/16', sourceip) OR INCIDR('169.254.0.0/16', sourceip) "
    "OR INCIDR ('127.0.0.0/8', sourceip)) AND (INCIDR('10.0.0.0/8',"
    "destinationip) OR INCIDR('172.16.0.0/12', destinationip) OR "
    "INCIDR('192.168.0.0/16', destinationip)) AND FULLNETWORKNAME(sourceip, "
    "domainId) = 'other' AND LOGSOURCETYPENAME(devicetype) != "
    "'Custom Rule Engine' AND NOT referencesetcontains('Known DNS traffic', "
    "destinationIP))) START '{start_time}' STOP '{stop_time}' PARAMETERS "
    "REMOTESERVERS=ARIELSERVERS4EPNAME(PROCESSORNAME({event_processor}))"
)

ALLOWED_OUTBOUND_TRAFFIC = (
    "SELECT DOMAINNAME(domainId) AS domainName,domainId AS 'Domain', eventCount"
    "  AS  'Event Count', destinationIP  AS  'Destination IP', destinationPort "
    " AS  'Destination Port', \"Rule Name\" as 'Rule Name (custom)', "
    "LOGSOURCENAME(logSourceId) AS 'Log Source', LOGSOURCETYPENAME(devicetype) "
    "AS 'Log Source Type', sourceIP  AS  'Source IP', startTime  AS  "
    "'Start Time', FULLNETWORKNAME(SourceIP, DomainID)  AS  'Source Network', "
    "QIDNAME(qid)  AS  'Event Name', destinationGeographicLocation AS "
    "'Destination Geographic Country/Region', Action, \"Policy Name\", "
    "\"Mitre Tactic\" AS 'Mitre Tactic', \"Mitre Technique\" AS "
    "'Mitre Technique' FROM events WHERE DOMAINNAME(domainId) = "
    "'{customer_name}' AND ((destinationport NOT IN (0, 1, 2, 3, 43, 161, 162)"
    " AND ((highlevelcategory = 4000 AND category IN (4002, 4007, 4012, 4016, "
    "4025, 4027, 4031, 4037, 4039))) AND (INCIDR('10.0.0.0/8',sourceip) OR "
    "INCIDR('172.16.0.0/12', sourceip) OR INCIDR('192.168.0.0/16', sourceip)) "
    "AND NOT (INCIDR('10.0.0.0/8',destinationip) OR INCIDR('172.16.0.0/12', "
    "destinationip) OR INCIDR('0.0.0.0/8', destinationip) OR "
    "INCIDR('192.168.0.0/16', destinationip) OR INCIDR('169.254.0.0/16', "
    "destinationip) OR INCIDR('127.0.0.0/8', destinationip)) AND "
    "FULLNETWORKNAME(destinationip, domainId) = 'other' AND "
    "LOGSOURCETYPENAME(devicetype) != 'Custom Rule Engine' AND NOT "
    "referencesetcontains('Known DNS traffic', destinationIP))) START "
    "'{start_time}' STOP '{stop_time}' PARAMETERS REMOTESERVERS="
    "ARIELSERVERS4EPNAME(PROCESSORNAME({event_processor}))"
)


def _gv(view: str) -> str:
    return (
        f"SELECT * FROM GLOBALVIEW('{view}','NORMAL') WHERE "
        "DOMAINNAME(domainId) = '{customer_name}' "
        "START '{start_time}' STOP '{stop_time}'"
    )


GLOBALVIEW_QUERIES = {
    "AuthenticationFailure": _gv("MongoDB_AuthenticationFailure"),
    "VPNAccess": _gv("MongoDB_VPNAccess"),
    "TopSecurityEvents": _gv("MongoDB_TopSecurityEvents"),
    "CREEvents": _gv("MongoDB_CREEvents"),
    "UBA": _gv("MongoDB_UBA"),
    "GroupModification": _gv("MongoDB_GroupModification"),
    "GroupModificationAzureActiveDirectory": _gv(
        "MongoDB_GroupModificationAzureActiveDirectory"
    ),
    "InteractiveLogonType2And10": _gv("MongoDB_LogonType"),
    "AuthenticationSuccess": _gv("MongoDB_AuthenticationSuccess"),
}

AQL_CORPUS: dict[str, str] = {
    "AllowedInboundTraffic": ALLOWED_INBOUND_TRAFFIC,
    "AllowedOutboundTraffic": ALLOWED_OUTBOUND_TRAFFIC,
    **GLOBALVIEW_QUERIES,
}

# Default parameters (reference hardcodes a 24 h window in
# qradar/query_builder.py:54-55; ours spans most of the synthetic data month).
DEFAULT_PARAMS: dict[str, str] = {
    "customer_name": "customer_1",
    "start_time": "2024-01-01 00:00:00",
    "stop_time": "2024-01-21 00:00:00",
    "event_processor": "ep1",
}


class QueryFileError(RuntimeError):
    """A query registry file is missing, malformed, or the wrong shape."""


def _load_json_with_context(path, validate, shape_msg: str):
    """Shared loader implementing the reference's error-context contract
    (``attributes.py:13-33``): a malformed file raises with the filename AND
    the first lines of the offending content quoted, so the operator sees
    the typo without opening the file.  Deliberate deviation: a typed
    :class:`QueryFileError` instead of the reference's ``SystemExit`` — a
    library must not kill the caller's driver process."""
    import json
    from pathlib import Path

    p = Path(path)
    try:
        with p.open("r") as f:
            data = json.load(f)
    except FileNotFoundError as e:
        raise QueryFileError(f"Error loading {p.name}: {e}") from e
    except json.JSONDecodeError as e:
        try:
            with p.open("r") as f:
                context = "".join(f.readlines()[:3])
        except OSError:
            context = "<unreadable>"
        raise QueryFileError(
            f"Error loading {p.name}: invalid JSON at line {e.lineno} "
            f"column {e.colno} ({e.msg}). Error near:\n{context}"
        ) from e
    if not validate(data):
        raise QueryFileError(f"Error loading {p.name}: expected {shape_msg}")
    return data


def load_query_file(path) -> dict[str, str]:
    """Load a ``{name: aql_string}`` JSON query registry from disk — the
    reference's external query-input channel (``qradar/input/queries.json``)
    via :func:`_load_json_with_context`.

    The loaded queries run through the same frontend as the built-in corpus:
    ``setup(spark, sf_dir).sql(load_query_file(p)["MyQuery"], params)``.
    """
    return _load_json_with_context(
        path,
        lambda d: isinstance(d, dict)
        and all(isinstance(k, str) and isinstance(v, str) for k, v in d.items()),
        'a flat {"query_name": "AQL string"} object',
    )


def load_ep_clients(path) -> dict[str, list[str]]:
    """Load the event-processor → customer mapping from ``ep_clients.json`` —
    the reference's second external input channel (``attributes.py:38-39``,
    consumed by ``run.py:44-51``, which zips EP ids with their customer
    lists into per-(EP, customer) work).  Shape: ``{"149": ["Customer A",
    ...], ...}`` — EP ids as string keys, customer-name lists as values.
    Same error-context contract as :func:`load_query_file`.
    """
    return _load_json_with_context(
        path,
        lambda d: isinstance(d, dict)
        and all(
            isinstance(k, str)
            and isinstance(v, list)
            and all(isinstance(c, str) for c in v)
            for k, v in d.items()
        ),
        '{"ep_id": ["customer name", ...]} with string keys and '
        "string-list values",
    )
